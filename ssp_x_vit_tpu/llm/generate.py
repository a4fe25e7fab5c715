"""Text generation + qualitative evaluation
(reference src/evaluation.py:149-184 generate_response / qualitative_results).

Greedy decoding with a static-shape KV-free loop: for the short qualitative
prompts (<=128 tokens) a full-sequence recompute per step is cheap and keeps
shapes static (one compile). A KV-cache decode path is a later optimization.
``no_repeat_ngram_size=3`` matches the reference generation kwargs; beam
search is approximated by greedy (reference uses beams=5 purely for the
qualitative section).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, llama_forward, llama_forward_materialized


def greedy_generate(
    params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    *,
    max_length: int = 64,
    eos_token_id: Optional[int] = None,
    no_repeat_ngram_size: int = 3,
) -> np.ndarray:
    ids = list(np.asarray(input_ids).reshape(-1).tolist())
    materialized = bool(cfg.pruned_attention_blocks)

    # One padded-shape compile: right-pad to max_length, read logits at cursor.
    pad = 0

    @jax.jit
    def step_logits(tokens, cursor):
        if materialized:
            logits = llama_forward_materialized(params, tokens, cfg)
        else:
            logits, _ = llama_forward(params, tokens, cfg)
        return logits[0, cursor]

    while len(ids) < max_length:
        tokens = np.full((1, max_length), pad, np.int32)
        tokens[0, : len(ids)] = ids
        logits = np.asarray(step_logits(jnp.asarray(tokens), len(ids) - 1))

        if no_repeat_ngram_size and len(ids) >= no_repeat_ngram_size - 1:
            n = no_repeat_ngram_size
            prefix = tuple(ids[-(n - 1):]) if n > 1 else ()
            banned = {
                ids[i + n - 1]
                for i in range(len(ids) - n + 1)
                if tuple(ids[i : i + n - 1]) == prefix
            }
            for b in banned:
                logits[b] = -np.inf

        nxt = int(np.argmax(logits))
        ids.append(nxt)
        if eos_token_id is not None and nxt == eos_token_id:
            break
    return np.asarray(ids)


def generate_response(prompt: str, params, cfg: LlamaConfig, tokenizer,
                      max_length: int = 512) -> str:
    enc = tokenizer(prompt, add_special_tokens=True)["input_ids"]
    out = greedy_generate(params, cfg, np.asarray(enc), max_length=max_length,
                          eos_token_id=getattr(tokenizer, "eos_token_id", None))
    return tokenizer.decode(out.tolist(), skip_special_tokens=True)


def qualitative_results(params, cfg: LlamaConfig, model_name_or_dir: str,
                        max_length: int = 64) -> None:
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_name_or_dir, use_fast=False)
    except Exception as e:
        logging.warning(f"Tokenizer unavailable ({e}); skipping qualitative results")
        return
    for prompt in ("Who is Albert Einstein?", "The theory of relativity"):
        logging.info(f"Prompt: {prompt}")
        logging.info("-" * 20)
        logging.info(generate_response(prompt, params, cfg, tokenizer, max_length))
