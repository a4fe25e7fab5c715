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
def _token_logprobs(params, tokens, cfg):
    """tokens [b, s] -> log p(tokens[t] | tokens[<t]) at positions 1..s-1.
    Model-family agnostic via generate.full_logits (llama family + MLA)."""
    from ssp_x_vit_tpu.llm.generate import full_logits

    logits = full_logits(params, tokens, cfg, jnp.bfloat16)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]  # [b, s-1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _token_logprobs_and_argmax(params, tokens, cfg):
    """Like ``_token_logprobs`` but also returns the greedy (argmax) token at
    each position — needed for the lm-eval harness ``is_greedy`` bit."""
    from ssp_x_vit_tpu.llm.generate import full_logits

    logits = full_logits(params, tokens, cfg, jnp.bfloat16)
    shifted = logits[:, :-1].astype(jnp.float32)
    logp = jax.nn.log_softmax(shifted, axis=-1)
    token_lp = jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    greedy = jnp.argmax(shifted, axis=-1)  # [b, s-1]
    return token_lp, greedy


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


def sequence_loglikelihood_greedy(
    params, cfg: LlamaConfig,
    context_tokens: Sequence[int],
    continuation_tokens: Sequence[int],
    *,
    pad_to: int = 0,
) -> tuple:
    """(log p(continuation | context), is_greedy) — the lm-eval harness
    ``loglikelihood`` contract: is_greedy is True iff every continuation token
    is the argmax prediction at its position (harness exact-match metrics use
    this bit; reference runs it via HFLM, lm_harness/lm_eval/models/huggingface.py)."""
    ids = list(context_tokens) + list(continuation_tokens)
    s = len(ids)
    padded = max(s, pad_to)
    tokens = np.zeros((1, padded), np.int32)
    tokens[0, :s] = ids
    lp, greedy = _token_logprobs_and_argmax(params, jnp.asarray(tokens), cfg)
    lp = np.asarray(lp)[0]
    greedy = np.asarray(greedy)[0]
    start = len(context_tokens) - 1
    n = len(continuation_tokens)
    ll = float(lp[start : start + n].sum())
    is_greedy = bool(
        (greedy[start : start + n] == np.asarray(continuation_tokens)).all()
    )
    return ll, is_greedy


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
