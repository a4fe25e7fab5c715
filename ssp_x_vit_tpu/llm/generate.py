"""Text generation + qualitative evaluation
(reference src/evaluation.py:149-184 generate_response / qualitative_results).

Greedy decoding with a static-shape KV-free loop: for the short qualitative
prompts (<=128 tokens) a full-sequence recompute per step is cheap and keeps
shapes static (one compile). A KV-cached decode path lives in
``llm/serve.py``. ``no_repeat_ngram_size=3`` matches the reference generation
kwargs; ``beam_generate`` is a true 5-beam search with the same n-gram ban,
matching the reference's ``num_beams=5`` qualitative protocol.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, llama_forward, llama_forward_materialized


def full_logits(params, tokens, cfg, compute_dtype, *, remat: bool = False):
    """[b, s] -> [b, s, V] logits for ANY served config — llama family or
    DeepSeek/MLA — picking the gated or materialized forward from the
    config. The one dispatch the qualitative-generation, lm-eval harness,
    and distillation-training paths share, so those surfaces are
    model-family agnostic (reference src/evaluation.py:69-160 runs them
    through HF generate/forward, which is likewise arch-generic).

    ``remat=True`` threads layer rematerialization into the scanned
    forwards (training under grad); the materialized (unrolled, pruned)
    forwards have no scanned layer to checkpoint, so it is a no-op there.
    """
    from ssp_x_vit_tpu.llm.deepseek import (DeepseekConfig, deepseek_forward,
                                            deepseek_forward_materialized)

    if isinstance(cfg, DeepseekConfig):
        if cfg.pruned_attention_blocks:
            return deepseek_forward_materialized(
                params, tokens, cfg, compute_dtype=compute_dtype)
        return deepseek_forward(params, tokens, cfg,
                                compute_dtype=compute_dtype, remat=remat)
    if cfg.pruned_attention_blocks:
        return llama_forward_materialized(params, tokens, cfg,
                                          compute_dtype=compute_dtype)
    logits, _ = llama_forward(params, tokens, cfg,
                              compute_dtype=compute_dtype, remat=remat)
    return logits


def greedy_generate(
    params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    *,
    max_length: int = 64,
    eos_token_id: Optional[int] = None,
    no_repeat_ngram_size: int = 3,
    compute_dtype=None,
) -> np.ndarray:
    import jax.numpy as _jnp

    compute_dtype = compute_dtype or _jnp.bfloat16
    ids = list(np.asarray(input_ids).reshape(-1).tolist())

    # One padded-shape compile: right-pad to max_length, read logits at cursor.
    pad = 0

    @jax.jit
    def step_logits(tokens, cursor):
        return full_logits(params, tokens, cfg, compute_dtype)[0, cursor]

    while len(ids) < max_length:
        tokens = np.full((1, max_length), pad, np.int32)
        tokens[0, : len(ids)] = ids
        logits = np.array(step_logits(jnp.asarray(tokens), len(ids) - 1))  # writable copy

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


def _banned_next_tokens(ids, n):
    """Tokens that would complete an already-seen n-gram (no_repeat_ngram)."""
    if not n or len(ids) < n - 1:
        return ()
    prefix = tuple(ids[-(n - 1):]) if n > 1 else ()
    return tuple(ids[i + n - 1] for i in range(len(ids) - n + 1)
                 if tuple(ids[i : i + n - 1]) == prefix)


def beam_generate(
    params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    *,
    max_length: int = 64,
    num_beams: int = 5,
    eos_token_id: Optional[int] = None,
    no_repeat_ngram_size: int = 3,
    early_stopping: bool = True,
    compute_dtype=None,
) -> np.ndarray:
    """Beam search matching the reference generation kwargs
    (src/evaluation.py:153-160: num_beams=5, no_repeat_ngram_size=3,
    early_stopping). All live beams are scored in ONE padded batched forward
    per step (shapes static -> a single compile)."""
    prompt = list(np.asarray(input_ids).reshape(-1).tolist())
    compute_dtype = compute_dtype or jnp.bfloat16

    @jax.jit
    def step_logits(tokens, cursor):
        logits = full_logits(params, tokens, cfg, compute_dtype)
        return jax.nn.log_softmax(logits[:, cursor].astype(jnp.float32), axis=-1)

    beams = [(0.0, prompt, False)]  # (logprob, ids, finished)
    while len(beams[0][1]) < max_length:
        if all(f for _, _, f in beams):
            break
        live = [(s, ids) for s, ids, f in beams if not f]
        done = [(s, ids, True) for s, ids, f in beams if f]
        if len(live[0][1]) >= max_length:
            break  # finished shorter beam on top (early_stopping False)
        tokens = np.zeros((num_beams, max_length), np.int32)
        for i, (_, ids) in enumerate(live):
            tokens[i, : len(ids)] = ids
        cursor = len(live[0][1]) - 1  # all live beams share a length
        logp = np.asarray(step_logits(jnp.asarray(tokens), cursor))  # [B, V]

        candidates = list(done)
        for i, (score, ids) in enumerate(live):
            row = logp[i].copy()
            for b in _banned_next_tokens(ids, no_repeat_ngram_size):
                row[b] = -np.inf
            top = np.argsort(-row)[: num_beams]
            for t in top:
                finished = eos_token_id is not None and int(t) == eos_token_id
                candidates.append((score + float(row[t]), ids + [int(t)], finished))
        candidates.sort(key=lambda c: c[0], reverse=True)
        beams = candidates[:num_beams]
        if early_stopping and beams[0][2]:
            break
    return np.asarray(beams[0][1])


def beam_generate_kv(
    params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    *,
    max_length: int = 64,
    num_beams: int = 5,
    eos_token_id: Optional[int] = None,
    no_repeat_ngram_size: int = 3,
    early_stopping: bool = True,
    cache_dtype=jnp.float32,
) -> np.ndarray:
    """KV-cached beam search — same selection math as ``beam_generate`` (one
    padded batched forward per step there) but each step is a CACHED decode:
    O(1) attention work per step instead of recomputing the whole prefix.
    Beam reordering is a cache-row gather (``cache[:, parents]``) before each
    step, so row i always holds beam i's exact history. Long qualitative
    prompts stop paying the O(len^2) recompute.

    Exact: cached logits equal full-recompute logits (the serve-path
    guarantee), so the chosen beams match ``beam_generate`` at f32.
    """
    from ssp_x_vit_tpu.llm.serve import (
        bucket_prompt_pad, decode_step, init_cache, prefill,
    )

    prompt = list(np.asarray(input_ids).reshape(-1).tolist())
    if len(prompt) >= max_length:
        return np.asarray(prompt[:max_length])
    B = num_beams
    p_pad = bucket_prompt_pad(len(prompt))
    max_len = p_pad + (max_length - len(prompt))

    # prefill ONCE ([1, p_pad]) and broadcast the cache rows to B beams —
    # B identical prefills would waste (B-1)x the prompt FLOPs.
    cache_k, cache_v = init_cache(cfg, 1, max_len, cache_dtype)
    tokens = np.zeros((1, p_pad), np.int32)
    tokens[0, p_pad - len(prompt):] = prompt
    pad_lens = jnp.full((B,), p_pad - len(prompt), jnp.int32)
    logits, cache_k, cache_v = prefill(params, jnp.asarray(tokens), cache_k,
                                       cache_v, cfg, pad_lens[:1])
    rep = lambda a: jnp.repeat(a, B, axis=1)
    cache_k = jax.tree.map(rep, cache_k)
    cache_v = jax.tree.map(rep, cache_v)
    logp = np.array(jax.nn.log_softmax(
        np.asarray(logits[0], np.float32)))                # rows identical
    for b in _banned_next_tokens(prompt, no_repeat_ngram_size):
        logp[b] = -np.inf
    top = np.argsort(-logp)[:B]
    # beams: (score, ids, finished, cache_row). After prefill all rows hold
    # the identical prompt history, so beam i takes row i.
    beams = [(float(logp[t]), prompt + [int(t)],
              eos_token_id is not None and int(t) == eos_token_id, i)
             for i, t in enumerate(top)]

    pos = p_pad
    while len(beams[0][1]) < max_length:
        if all(f for _, _, f, _ in beams):
            break
        if early_stopping and beams[0][2]:
            break
        live = [bm for bm in beams if not bm[2]]
        done = [bm for bm in beams if bm[2]]
        if len(live[0][1]) >= max_length:
            # a FINISHED shorter beam holds the top slot (early_stopping
            # False): live beams are at the cap — extending further would
            # write past the cache (dynamic_update_slice would silently
            # clamp into the last slot)
            break
        # align cache rows to live beams: row i <- live[i]'s history
        parents = np.zeros((B,), np.int32)
        feed = np.zeros((B,), np.int32)
        for i, (_, ids, _, row) in enumerate(live):
            parents[i] = row
            feed[i] = ids[-1]
        gather = lambda a: jnp.take(a, jnp.asarray(parents), axis=1)
        cache_k = jax.tree.map(gather, cache_k)
        cache_v = jax.tree.map(gather, cache_v)

        logits, cache_k, cache_v = decode_step(
            params, jnp.asarray(feed), cache_k, cache_v, cfg,
            jnp.asarray(pos, jnp.int32), pad_lens)
        pos += 1
        logp = np.array(jax.nn.log_softmax(
            np.asarray(logits, np.float32), axis=-1))      # [B, V]

        candidates = [(s, ids, True, row) for s, ids, _, row in done]
        for i, (score, ids, _, _) in enumerate(live):
            row = logp[i].copy()
            for b in _banned_next_tokens(ids, no_repeat_ngram_size):
                row[b] = -np.inf
            for t in np.argsort(-row)[:B]:
                fin = eos_token_id is not None and int(t) == eos_token_id
                # parent cache row AFTER the gather+write is i
                candidates.append((score + float(row[t]), ids + [int(t)],
                                   fin, i))
        candidates.sort(key=lambda c: c[0], reverse=True)
        # finished beams keep their (stale) row harmlessly — they are never
        # fed again; live beams' rows are re-gathered next iteration.
        beams = candidates[:B]
    return np.asarray(beams[0][1])


def generate_response(prompt: str, params, cfg: LlamaConfig, tokenizer,
                      max_length: int = 512, num_beams: int = 5) -> str:
    enc = tokenizer(prompt, add_special_tokens=True)["input_ids"]
    eos = getattr(tokenizer, "eos_token_id", None)
    if num_beams > 1:
        out = beam_generate(params, cfg, np.asarray(enc), max_length=max_length,
                            num_beams=num_beams, eos_token_id=eos)
    else:
        out = greedy_generate(params, cfg, np.asarray(enc), max_length=max_length,
                              eos_token_id=eos)
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
