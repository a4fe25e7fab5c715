"""KV-cached autoregressive decoding (serving path).

The reference's generation recomputes the full sequence every step
(HF generate on a research box); for production serving this module provides
the TPU-native incremental path: a static-shape KV cache ([L, b, max_len,
n_kv, head_dim]), one compiled prefill and one compiled decode step (cache
donated, position-indexed updates via dynamic_update_slice) — zero retraces
for any prompt/generation length up to the bucket size.

Llama-layout models only (the phi parallel block would need its own step fn).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params, rms_norm


def _rope_at(q, k, positions, theta):
    """Rotary embedding at explicit positions. q/k: [b, s, h, hd]; positions [s]."""
    hd = q.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = jnp.outer(positions.astype(jnp.float32), inv_freq)  # [s, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos = jnp.cos(emb)[None, :, None, :]
    sin = jnp.sin(emb)[None, :, None, :]

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    return ((q32 * cos + rot(q32) * sin).astype(q.dtype),
            (k32 * cos + rot(k32) * sin).astype(k.dtype))


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _block_qkv(x, bp, cfg: LlamaConfig, positions, compute_dtype):
    b, s, _ = x.shape
    q = x @ bp["q_kernel"].astype(compute_dtype)
    k = x @ bp["k_kernel"].astype(compute_dtype)
    v = x @ bp["v_kernel"].astype(compute_dtype)
    if "q_bias" in bp:
        q = q + bp["q_bias"].astype(compute_dtype)
        k = k + bp["k_bias"].astype(compute_dtype)
        v = v + bp["v_bias"].astype(compute_dtype)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q, k = _rope_at(q, k, positions, cfg.rope_theta)
    return q, k, v


def _attend_cached(q, ck, cv, query_positions, cfg: LlamaConfig):
    """q [b, s_q, h, hd] over cached k/v [b, max_len, nkv, hd]; each query row
    attends to key positions <= its own position (causal over the cache)."""
    b, s_q, h, hd = q.shape
    rep = cfg.num_heads // cfg.num_kv_heads
    k = jnp.repeat(ck, rep, axis=2) if rep > 1 else ck
    v = jnp.repeat(cv, rep, axis=2) if rep > 1 else cv
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / (hd ** 0.5)
    key_pos = jnp.arange(k.shape[1])[None, :]         # [1, max_len]
    mask = key_pos <= query_positions[:, None]        # [s_q, max_len]
    logits = jnp.where(mask[None, None], logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s_q, h * hd)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def prefill(params: Params, tokens: jax.Array, cache_k, cache_v, cfg: LlamaConfig,
            prompt_len: jax.Array):
    """Run the prompt ([b, P_pad], right-padded) through the model, filling the
    cache; returns (logits at the last real position [b, V], cache_k, cache_v)."""
    compute_dtype = cache_k.dtype
    b, p_pad = tokens.shape
    x = params["embed"].astype(compute_dtype)[tokens]
    positions = jnp.arange(p_pad)

    def body(x, scanned):
        bp, ck_l, cv_l = scanned
        h = rms_norm(x, bp["ln1"], cfg.rms_eps)
        q, k, v = _block_qkv(h, bp, cfg, positions, compute_dtype)
        ck_l = jax.lax.dynamic_update_slice(ck_l, k.astype(ck_l.dtype), (0, 0, 0, 0))
        cv_l = jax.lax.dynamic_update_slice(cv_l, v.astype(cv_l.dtype), (0, 0, 0, 0))
        attn = _attend_cached(q, ck_l, cv_l, positions, cfg)
        attn = attn @ bp["o_kernel"].astype(compute_dtype)
        x = x + attn
        h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
        g = h2 @ bp["gate_kernel"].astype(compute_dtype)
        u = h2 @ bp["up_kernel"].astype(compute_dtype)
        x = x + (jax.nn.silu(g) * u) @ bp["down_kernel"].astype(compute_dtype)
        return x, (ck_l, cv_l)

    x, (cache_k, cache_v) = jax.lax.scan(body, x, (params["blocks"], cache_k, cache_v))
    x = rms_norm(x, params["ln_final"], cfg.rms_eps)
    head = params.get("lm_head", params["embed"].T)
    logits = (x @ head.astype(compute_dtype)).astype(jnp.float32)  # [b, p_pad, V]
    idx = jnp.full((b, 1, 1), prompt_len - 1, jnp.int32)
    last = jnp.take_along_axis(logits, jnp.broadcast_to(idx, (b, 1, logits.shape[-1])),
                               axis=1)[:, 0]
    return last, cache_k, cache_v


def _decode_body(params: Params, token: jax.Array, cache_k, cache_v,
                 cfg: LlamaConfig, pos: jax.Array):
    compute_dtype = cache_k.dtype
    b = token.shape[0]
    x = params["embed"].astype(compute_dtype)[token][:, None, :]  # [b, 1, d]
    positions = pos[None]

    def body(x, scanned):
        bp, ck_l, cv_l = scanned
        h = rms_norm(x, bp["ln1"], cfg.rms_eps)
        q, k, v = _block_qkv(h, bp, cfg, positions, compute_dtype)
        ck_l = jax.lax.dynamic_update_slice(ck_l, k.astype(ck_l.dtype), (0, pos, 0, 0))
        cv_l = jax.lax.dynamic_update_slice(cv_l, v.astype(cv_l.dtype), (0, pos, 0, 0))
        attn = _attend_cached(q, ck_l, cv_l, positions, cfg)
        x = x + attn @ bp["o_kernel"].astype(compute_dtype)
        h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
        g = h2 @ bp["gate_kernel"].astype(compute_dtype)
        u = h2 @ bp["up_kernel"].astype(compute_dtype)
        x = x + (jax.nn.silu(g) * u) @ bp["down_kernel"].astype(compute_dtype)
        return x, (ck_l, cv_l)

    x, (cache_k, cache_v) = jax.lax.scan(body, x, (params["blocks"], cache_k, cache_v))
    x = rms_norm(x, params["ln_final"], cfg.rms_eps)
    head = params.get("lm_head", params["embed"].T)
    logits = (x[:, 0] @ head.astype(compute_dtype)).astype(jnp.float32)
    return logits, cache_k, cache_v


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def decode_step(params: Params, token: jax.Array, cache_k, cache_v,
                cfg: LlamaConfig, pos: jax.Array):
    """One token ([b] int32) at position ``pos``; returns (logits [b, V], caches)."""
    return _decode_body(params, token, cache_k, cache_v, cfg, pos)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"), donate_argnums=(2, 3))
def greedy_decode_scan(params: Params, first_token: jax.Array, cache_k, cache_v,
                       cfg: LlamaConfig, start_pos: jax.Array, num_steps: int):
    """Run ``num_steps`` greedy decode steps ENTIRELY on device (lax.scan with
    token feedback) — one dispatch for the whole generation, which matters on
    dispatch-latency-bound links (docs/tpu_notes.md). Returns the generated
    tokens [num_steps, b] and the final caches."""

    def step(carry, _):
        token, ck, cv, pos = carry
        logits, ck, cv = _decode_body(params, token, ck, cv, cfg, pos)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, ck, cv, pos + 1), nxt

    (_, cache_k, cache_v, _), tokens = jax.lax.scan(
        step, (first_token, cache_k, cache_v, start_pos), None, length=num_steps)
    return tokens, cache_k, cache_v


def greedy_generate_kv_scan(
    params: Params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    *,
    max_length: int = 64,
    cache_dtype=jnp.bfloat16,
) -> np.ndarray:
    """Whole-generation-on-device greedy decoding: prefill + ONE scan dispatch
    (no per-token host round trips; no early eos stop by construction)."""
    if cfg.is_phi or cfg.pruned_attention_blocks:
        raise NotImplementedError("KV serve path covers dense llama-layout models")
    prompt = np.asarray(input_ids).reshape(-1).astype(np.int32)
    cache_k, cache_v = init_cache(cfg, 1, max_length, cache_dtype)
    tokens = np.zeros((1, max_length), np.int32)
    tokens[0, : len(prompt)] = prompt
    logits, cache_k, cache_v = prefill(
        params, jnp.asarray(tokens), cache_k, cache_v, cfg,
        jnp.asarray(len(prompt), jnp.int32))
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # token at pos P
    num_steps = max_length - len(prompt) - 1
    if num_steps <= 0:
        return np.concatenate([prompt, np.asarray(first)])[:max_length]
    gen, _, _ = greedy_decode_scan(params, first, cache_k, cache_v, cfg,
                                   jnp.asarray(len(prompt), jnp.int32), num_steps)
    return np.concatenate([prompt, np.asarray(first), np.asarray(gen)[:, 0]])


def greedy_generate_kv(
    params: Params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    *,
    max_length: int = 64,
    eos_token_id: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
) -> np.ndarray:
    """KV-cached greedy decoding (functionally equals generate.greedy_generate
    without n-gram banning). One prefill compile + one decode-step compile."""
    if cfg.is_phi or cfg.pruned_attention_blocks:
        raise NotImplementedError("KV serve path covers dense llama-layout models")
    prompt = np.asarray(input_ids).reshape(-1).astype(np.int32)
    b = 1
    cache_k, cache_v = init_cache(cfg, b, max_length, cache_dtype)
    p_pad = max_length  # one bucket; prompts are short in this workload

    tokens = np.zeros((b, p_pad), np.int32)
    tokens[0, : len(prompt)] = prompt
    logits, cache_k, cache_v = prefill(
        params, jnp.asarray(tokens), cache_k, cache_v, cfg,
        jnp.asarray(len(prompt), jnp.int32))

    ids = list(prompt.tolist())
    while len(ids) < max_length:
        nxt = int(np.argmax(np.asarray(logits)[0]))
        ids.append(nxt)
        if eos_token_id is not None and nxt == eos_token_id:
            break
        if len(ids) >= max_length:
            break
        logits, cache_k, cache_v = decode_step(
            params, jnp.asarray([nxt], jnp.int32), cache_k, cache_v, cfg,
            jnp.asarray(len(ids) - 1, jnp.int32))
    return np.asarray(ids)
