"""Self-speculative decoding: a 2SSP-pruned draft accelerates its own dense model.

The framework's pruned models are natural draft models — same tokenizer,
same training distribution, materially cheaper per step (scripts/bench_serve:
37.5%-pruned decodes 1.39x faster). Greedy speculative decoding makes the
composite EXACTLY equal to dense greedy decoding (Leviathan et al.'s greedy
case): the draft proposes ``k`` tokens, ONE dense forward over the k+1-token
window verifies them, and the longest agreeing prefix plus the dense model's
own next token are accepted.

TPU-native shape: the entire propose/verify/accept loop runs on device in a
``lax.while_loop`` (static shapes; accepted counts are traced scalars; stale
cache slots are overwritten before any query can attend to them, because
causal masking only exposes keys at positions <= the query — plus one
explicit repair write per round for the fully-accepted case, see draft_k).
One dispatch per generation, like serve.decode_scan — no per-round host
trips.

The reference has no serving machinery at all; this composes the rebuild's
serve path with its pruning outputs. b=1 streams (the latency-bound case
speculation exists for).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params, _embed_tokens
from ssp_x_vit_tpu.llm.serve import (
    _decode_body, _final_logits, _run_layers,
    cache_compute_dtype as serve_cache_dtype, init_cache, prefill,
)


def _extend_body(params, tokens, cache_k, cache_v, cfg: LlamaConfig,
                 write_pos):
    """Multi-token cached forward: tokens [1, w] at global positions
    ``write_pos + arange(w)``; returns logits at ALL w positions [1, w, V]."""
    compute_dtype = serve_cache_dtype(cache_k)
    b, w = tokens.shape
    x = _embed_tokens(params, tokens, cfg, compute_dtype)
    idx = write_pos + jnp.arange(w)
    global_positions = jnp.broadcast_to(idx[None], (b, w))
    pad_lens = jnp.zeros((b,), jnp.int32)
    x, cache_k, cache_v = _run_layers(
        params, x, cache_k, cache_v, cfg,
        global_positions=global_positions, rope_positions=global_positions,
        pad_lens=pad_lens, write_pos=write_pos, compute_dtype=compute_dtype)
    return _final_logits(params, x, cfg, compute_dtype), cache_k, cache_v


@functools.partial(
    jax.jit,
    static_argnames=("dense_cfg", "draft_cfg", "k", "max_steps"),
    donate_argnums=(4, 5, 6, 7),
)
def spec_decode_scan(dense_params: Params, draft_params: Params,
                     first_token: jax.Array, prev_token: jax.Array,
                     dense_ck, dense_cv,
                     draft_ck, draft_cv, dense_cfg: LlamaConfig,
                     draft_cfg: LlamaConfig, start_pos: jax.Array,
                     k: int, max_steps: int):
    """Generate ``max_steps`` greedy tokens via draft-k/verify-1 rounds,
    entirely on device. ``first_token`` [1] is the dense model's greedy token
    after prefill (already part of the output), ``prev_token`` [1] is the last
    PROMPT token (sequence index ``start_pos - 1``; each draft round re-writes
    that cache slot, see draft_k), positions start at ``start_pos`` for BOTH
    caches (same prompt prefilled into each).

    Returns (tokens [max_steps + k + 1] int32 — first ``max_steps`` valid,
    rounds, accepted_draft_tokens)."""
    pad0 = jnp.zeros((1,), jnp.int32)
    cap = max_steps + k + 1
    out0 = jnp.zeros((cap,), jnp.int32).at[0].set(first_token[0])

    def draft_k(prev, tok, ck, cv, pos):
        """Propose k tokens. The FIRST step is a 2-token extend over
        [prev@pos-1, tok@pos]: re-writing pos-1 repairs the draft-cache hole
        left by a fully-accepted round (the k-th draft's KV is never written
        during drafting, and after m == k the next round would otherwise start
        PAST that slot, leaving a permanent zero-KV hole that degrades every
        later proposal — found as a 0.16 self-draft acceptance on TPU)."""
        pair = jnp.concatenate([prev, tok])[None]              # [1, 2]
        lg2, ck, cv = _extend_body(draft_params, pair, ck, cv, draft_cfg,
                                   pos - 1)
        d0 = jnp.argmax(lg2[:, 1], axis=-1).astype(jnp.int32)  # [1]

        def dstep(carry, _):
            t, ck, cv, p = carry
            logits, ck, cv = _decode_body(draft_params, t, ck, cv, draft_cfg,
                                          p, pad0)
            nt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nt, ck, cv, p + 1), nt[0]

        (_, ck, cv, _), rest = jax.lax.scan(
            dstep, (d0, ck, cv, pos + 1), None, length=k - 1)
        return jnp.concatenate([d0, rest]), ck, cv             # drafts [k]

    def cond(c):
        return c[0] < 1 + max_steps

    def body(c):
        (n_out, prev, nxt, dck, dcv, fck, fcv, pos, out, rounds, accepted) = c
        drafts, fck_d, fcv_d = draft_k(prev, nxt, fck, fcv, pos)
        window = jnp.concatenate([nxt, drafts])                # [k+1]
        logits, dck, dcv = _extend_body(dense_params, window[None], dck, dcv,
                                        dense_cfg, pos)
        ys = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [k+1]
        match = drafts == ys[:k]
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))      # leading agrees
        acc = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)]).at[m].set(ys[m])
        out = jax.lax.dynamic_update_slice(out, acc, (n_out,))
        n_acc = m + 1
        # token at sequence index (pos + n_acc) - 1 — next round's `prev`
        return (n_out + n_acc, window[m][None], ys[m][None], dck, dcv,
                fck_d, fcv_d, pos + n_acc, out, rounds + 1, accepted + m)

    init = (jnp.asarray(1, jnp.int32), prev_token, first_token,
            dense_ck, dense_cv, draft_ck, draft_cv, start_pos, out0,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    (n_out, _, _, _, _, _, _, _, out, rounds, accepted) = jax.lax.while_loop(
        cond, body, init)
    return out, rounds, accepted


def speculative_generate(
    dense_params: Params, dense_cfg: LlamaConfig,
    draft_params: Params, draft_cfg: LlamaConfig,
    input_ids, *, max_length: int = 64, k: int = 4,
    eos_token_id: Optional[int] = None, cache_dtype=jnp.bfloat16,
) -> Tuple[np.ndarray, dict]:
    """Greedy generation from the DENSE model, accelerated by the draft.

    Output is exactly ``serve.generate_kv_scan(dense_params, ...)``'s greedy
    result. Returns (tokens, stats) with stats = {rounds, accepted_drafts,
    acceptance_rate}."""
    prompt = np.asarray(input_ids, np.int32).reshape(1, -1)
    p = prompt.shape[1]
    if p >= max_length:
        raise ValueError("prompt longer than max_length")
    max_steps = max_length - p
    cache_len = p + max_steps + k + 2

    dck, dcv = init_cache(dense_cfg, 1, cache_len, cache_dtype)
    fck, fcv = init_cache(draft_cfg, 1, cache_len, cache_dtype)
    pad0 = jnp.zeros((1,), jnp.int32)
    logits, dck, dcv = prefill(dense_params, jnp.asarray(prompt), dck, dcv,
                               dense_cfg, pad0)
    _, fck, fcv = prefill(draft_params, jnp.asarray(prompt), fck, fcv,
                          draft_cfg, pad0)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)     # [1]

    out, rounds, accepted = spec_decode_scan(
        dense_params, draft_params, first,
        jnp.asarray(prompt[:, -1]), dck, dcv, fck, fcv,
        dense_cfg, draft_cfg, jnp.asarray(p, jnp.int32), k, max_steps - 1)
    gen = np.asarray(out)[:max_steps].tolist()
    if eos_token_id is not None and eos_token_id in gen:
        gen = gen[: gen.index(eos_token_id) + 1]
    stats = {
        "rounds": int(rounds),
        "accepted_drafts": int(accepted),
        "acceptance_rate": float(accepted) / max(1, int(rounds) * k),
    }
    return np.asarray(prompt[0].tolist() + gen, np.int32), stats
