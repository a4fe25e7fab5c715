"""Zero-shot multiple-choice evaluation core (standalone).

Implements the scoring mechanism behind the reference's downstream evaluation
(lm-eval harness tasks winogrande/arc/hellaswag/piqa/mmlu are all
loglikelihood-comparison multiple choice, reference src/evaluation.py:69-116):
for each example, score ``context + choice_i`` by total (or length-normalized)
log-likelihood of the choice tokens and pick the argmax.

This module is harness-independent — tasks are plain dicts — so the capability
works offline; llm/downstream.py plugs the same model scoring into the real
lm-eval harness when that package is available.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, llama_forward, llama_forward_materialized


@functools.partial(jax.jit, static_argnames=("cfg",))
def _token_logprobs(params, tokens, cfg: LlamaConfig):
    """tokens [b, s] -> log p(tokens[t] | tokens[<t]) at positions 1..s-1."""
    if cfg.pruned_attention_blocks:
        logits = llama_forward_materialized(params, tokens, cfg)
    else:
        logits, _ = llama_forward(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]  # [b, s-1]


def sequence_loglikelihood(
    params, cfg: LlamaConfig,
    context_tokens: Sequence[int],
    continuation_tokens: Sequence[int],
    *,
    pad_to: int = 0,
) -> float:
    """log p(continuation | context), summed over continuation tokens.

    Right-padding keeps shapes bucketed (causality makes pad positions inert).
    """
    ids = list(context_tokens) + list(continuation_tokens)
    s = len(ids)
    padded = max(s, pad_to)
    tokens = np.zeros((1, padded), np.int32)
    tokens[0, :s] = ids
    lp = np.asarray(_token_logprobs(params, jnp.asarray(tokens), cfg))[0]  # [padded-1]
    start = len(context_tokens) - 1  # prediction of first continuation token
    return float(lp[start : start + len(continuation_tokens)].sum())


def evaluate_multiple_choice(
    params, cfg: LlamaConfig,
    examples: List[Dict],
    encode: Callable[[str], List[int]],
    *,
    length_normalized: bool = False,
    bucket: int = 128,
) -> Dict[str, float]:
    """examples: [{"context": str, "choices": [str,...], "label": int}].

    Returns {"acc": ..., "count": ...}. Sequences are padded to multiples of
    ``bucket`` so a handful of compiled shapes covers the whole task.
    """
    correct = 0
    for ex in examples:
        ctx = encode(ex["context"])
        scores = []
        for choice in ex["choices"]:
            cont = encode(choice)
            total = len(ctx) + len(cont)
            pad_to = -(-total // bucket) * bucket
            ll = sequence_loglikelihood(params, cfg, ctx, cont, pad_to=pad_to)
            scores.append(ll / len(cont) if length_normalized else ll)
        if int(np.argmax(scores)) == ex["label"]:
            correct += 1
    n = len(examples)
    return {"acc": correct / max(1, n), "count": n}
