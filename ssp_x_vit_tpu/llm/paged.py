"""Paged-KV serving with continuous batching.

Extends llm/serve.py (contiguous per-request caches, shared write position)
with the vLLM memory model on TPU:

- one physical page pool per layer (``[A, nkv, num_pages, page_size, hd]``),
  sequences own pages through per-slot page tables;
- per-sequence independent positions — no left-padding, no shared write
  position, so requests of different lengths decode in ONE batched step and
  new requests join as slots free (continuous batching);
- pages are allocated on demand as a sequence crosses a page boundary and
  returned to the free list when the request completes — freed memory is
  immediately reusable by longer later requests (the contiguous cache cannot
  do this: its ``max_len`` slots are committed per batch for the whole run);
- page 0 is a reserved trash page: padded prefill positions and inactive
  slots write there, keeping every jit shape static.

Attention over the paged pool runs through ops/pallas/paged_attention.py
(scalar-prefetched page-table walks on TPU, jnp gather reference elsewhere).
Covers llama-layout models (llama/mistral/qwen2/phi-3-as-llama), phi-2's
parallel block, and width/depth-materialized pruned models (pool rows only
for surviving attention layers, cf. serve._run_layers); greedy decode.

The reference has no serving machinery (generation recomputes the full
sequence per token, src/evaluation.py:149-184); this is part of the
rebuild's beyond-reference serving subsystem.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import (
    LlamaConfig, Params, _embed_tokens, _glu_act, _layer_norm, rms_norm,
)
from ssp_x_vit_tpu.llm import serve as _serve
from ssp_x_vit_tpu.llm.serve import (
    _LLAMA_ATTN_KEYS, _block_qkv, _final_logits, _mm, bucket_prompt_pad,
    cache_compute_dtype, num_attn_layers,
)
from ssp_x_vit_tpu.ops.pallas.paged_attention import (
    _page_size_of, paged_attention, paged_cache_write, paged_cache_write_many,
)

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def init_paged_pools(cfg: LlamaConfig, num_pages: int, page_size: int,
                     dtype=jnp.bfloat16):
    """[A, nkv, num_pages, page_size, hd] x2 (page 0 reserved as trash); one
    pool row per SURVIVING attention layer (depth-pruned blocks hold none)."""
    if cfg.is_opt:
        raise ValueError("paged serving covers llama-layout and phi models")
    shape = (num_attn_layers(cfg), cfg.num_kv_heads, num_pages, page_size,
             cfg.head_dim)
    if dtype == jnp.int8:
        # quantized pools: int8 codes + f32 per-token-per-head scales
        # (cf. serve.init_cache); the page-walk kernel folds the scales in
        # its score/weight epilogues so page bytes HALVE.
        def mk():
            return {"q": jnp.zeros(shape, jnp.int8),
                    "s": jnp.ones(shape[:-1], jnp.float32)}
        return mk(), mk()
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _write_many_masked(kp, vp, k_new, v_new, page_table, seq_len):
    """Prefill write of s consecutive tokens for one sequence; positions
    >= seq_len are redirected to trash page 0 (shared ops helper)."""
    from ssp_x_vit_tpu.ops.pallas.paged_attention import paged_cache_write_many

    return paged_cache_write_many(kp, vp, k_new, v_new, page_table, 0,
                                  valid_len=seq_len)


def _mlp_branch(h2, bp, cfg: LlamaConfig, compute_dtype):
    if getattr(cfg, "num_experts", 0):
        # dropless switch/top-k expert MLP — same path and exactness
        # argument as contiguous serving (docs/serving.md MoE section)
        from ssp_x_vit_tpu.llm.model import _moe_mlp

        mlp, _ = _moe_mlp(h2, bp, cfg, compute_dtype)
        return mlp
    if cfg.is_phi:
        from ssp_x_vit_tpu.ops.common import gelu

        hm = _mm(h2, bp, "fc1_kernel", compute_dtype) + \
            bp["fc1_bias"].astype(compute_dtype)
        return _mm(gelu(hm), bp, "fc2_kernel", compute_dtype) + \
            bp["fc2_bias"].astype(compute_dtype)
    if any(k.startswith("gateup_kernel") for k in bp):
        gu = _mm(h2, bp, "gateup_kernel", compute_dtype)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = _mm(h2, bp, "gate_kernel", compute_dtype)
        u = _mm(h2, bp, "up_kernel", compute_dtype)
    return _mm(_glu_act(cfg)(g) * u, bp, "down_kernel", compute_dtype)


def _o_proj(attn, bp, compute_dtype):
    out = _mm(attn, bp, "o_kernel", compute_dtype)
    if "o_bias" in bp:
        out = out + bp["o_bias"].astype(compute_dtype)
    return out


def _paged_layer(x, bp, kp_l, vp_l, cfg: LlamaConfig, page_tables, seq_lens,
                 compute_dtype, has_attn=True, window_bound=None,
                 layer_idx=None):
    """One decode-step layer over the paged cache (mirrors serve._layer_step:
    llama sequential / phi parallel / gemma-2 post-norms / attention
    physically absent). ``window_bound``: traced per-layer band bound.

    ``layer_idx`` (traced) addresses this layer's row of FULL 5D pools —
    the decode hot loop carries the whole multi-layer pool and writes it in
    place (pallas aliased kernel); kp_l/vp_l are then the full pools, never
    sliced. With layer_idx=None they are single-layer 4D pools (legacy
    contract, kept for the MLA absorbed path and tests)."""
    b = x.shape[0]

    def attend(h):
        q, k, v = _block_qkv(h, bp, cfg, seq_lens[:, None], compute_dtype)
        kp, vp = paged_cache_write(kp_l, vp_l, k[:, 0], v[:, 0],
                                   page_tables, seq_lens, layer_idx=layer_idx)
        band = window_bound if window_bound is not None else cfg.sliding_window
        starts = None
        if band is not None:
            # query position == seq_lens; HF window: keys k with
            # q - k < window  ->  k >= seq_lens + 1 - window.
            starts = jnp.maximum(seq_lens + 1 - band, 0)
        attn = paged_attention(q[:, 0], kp, vp, page_tables, seq_lens + 1,
                               start_lens=starts, softcap=cfg.attn_softcap,
                               layer_idx=layer_idx)
        return _o_proj(attn.reshape(b, 1, -1), bp, compute_dtype), kp, vp

    if cfg.is_phi:
        h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
        delta = jnp.zeros_like(x)
        if has_attn:
            delta, kp_l, vp_l = attend(h)
        return x + delta + _mlp_branch(h, bp, cfg, compute_dtype), kp_l, vp_l

    if has_attn:
        attn, kp_l, vp_l = attend(rms_norm(x, bp["ln1"], cfg.rms_eps))
        if cfg.is_gemma2:
            attn = rms_norm(attn, bp["ln1_post"], cfg.rms_eps)
        x = x + attn
    h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
    mlp = _mlp_branch(h2, bp, cfg, compute_dtype)
    if cfg.is_gemma2:
        mlp = rms_norm(mlp, bp["ln2_post"], cfg.rms_eps)
    return x + mlp, kp_l, vp_l


def _prefill_layer(x, bp, kp_l, vp_l, cfg: LlamaConfig, page_table, seq_len,
                   compute_dtype, has_attn=True, window_bound=None):
    """One prefill layer ([1, p_pad] full-sequence causal attention +
    masked page writes)."""
    _, p_pad, _ = x.shape

    def attend(h):
        positions = jnp.arange(p_pad)[None]
        q, k, v = _block_qkv(h, bp, cfg, positions, compute_dtype)
        kp, vp = _write_many_masked(kp_l, vp_l, k[0], v[0], page_table, seq_len)
        rep = cfg.num_heads // cfg.num_kv_heads
        kf = jnp.repeat(k, rep, axis=2) if rep > 1 else k
        vf = jnp.repeat(v, rep, axis=2) if rep > 1 else v
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kf,
                            preferred_element_type=jnp.float32) / cfg.head_dim**0.5
        if cfg.attn_softcap is not None:
            logits = cfg.attn_softcap * jnp.tanh(logits / cfg.attn_softcap)
        row = jnp.arange(p_pad)[:, None]
        col = jnp.arange(p_pad)[None, :]
        mask = (col <= row) & (col < seq_len)
        band = window_bound if window_bound is not None else cfg.sliding_window
        if band is not None:
            mask = mask & (row - col < band)
        logits = jnp.where(mask[None, None], logits, _NEG_INF)
        w = jax.nn.softmax(logits, axis=-1).astype(vf.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, vf).reshape(1, p_pad, -1)
        return _o_proj(attn, bp, compute_dtype), kp, vp

    if cfg.is_phi:
        h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
        delta = jnp.zeros_like(x)
        if has_attn:
            delta, kp_l, vp_l = attend(h)
        return x + delta + _mlp_branch(h, bp, cfg, compute_dtype), kp_l, vp_l

    if has_attn:
        attn, kp_l, vp_l = attend(rms_norm(x, bp["ln1"], cfg.rms_eps))
        if cfg.is_gemma2:
            attn = rms_norm(attn, bp["ln1_post"], cfg.rms_eps)
        x = x + attn
    h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
    mlp = _mlp_branch(h2, bp, cfg, compute_dtype)
    if cfg.is_gemma2:
        mlp = rms_norm(mlp, bp["ln2_post"], cfg.rms_eps)
    return x + mlp, kp_l, vp_l


def _splice_layer(full, one, layer_idx):
    """Write a single-layer pool back into row ``layer_idx`` of the 5D
    pool (prefill slice/splice path only — the decode hot loop never
    materializes layer copies)."""
    return jax.tree.map(
        lambda f, o: jax.lax.dynamic_update_index_in_dim(
            f, o.astype(f.dtype), layer_idx, 0), full, one)


def _run_paged_layers(layer_fn, params, x, k_pools, v_pools, cfg: LlamaConfig,
                      table, lens):
    """Dense models scan the stacked pytree with the pools as CARRY —
    NOT as scanned xs/ys: stacked scan outputs re-materialize every
    layer's full pool slice per step, measured 12 ms/step of pure HBM
    shuffling at b=8/16 layers/2048 ctx (scripts/bench_paged_gap.py). The
    decode layer (_paged_layer) addresses its pool row in place through the
    layer-indexed pallas kernels; prefill layers (which re-read the whole
    gathered cache anyway, a once-per-request cost) slice their layer and
    splice it back. Depth-materialized models unroll with attn_store_index
    (cf. serve._run_layers)."""
    from ssp_x_vit_tpu.ops.pallas.paged_attention import _layer_of

    compute_dtype = cache_compute_dtype(k_pools)
    blocks = params["blocks"]
    wbounds = jnp.asarray(cfg.layer_window_bounds, jnp.int32)
    hot = layer_fn is _paged_layer    # decode: full-pool in-place writes

    def call(x, bp, kp, vp, li, wb, has_attn=True):
        if hot:
            return layer_fn(x, bp, kp, vp, cfg, table, lens, compute_dtype,
                            has_attn=has_attn, window_bound=wb, layer_idx=li)
        if not has_attn:
            return layer_fn(x, bp, None, None, cfg, table, lens,
                            compute_dtype, has_attn=False, window_bound=wb)
        x, kl, vl = layer_fn(x, bp, _layer_of(kp, li), _layer_of(vp, li),
                             cfg, table, lens, compute_dtype, window_bound=wb)
        return x, _splice_layer(kp, kl, li), _splice_layer(vp, vl, li)

    if not cfg.pruned_attention_blocks:
        def body(carry, scanned):
            x, kp, vp = carry
            bp, wb, li = scanned
            x, kp, vp = call(x, bp, kp, vp, li,
                             None if cfg.uniform_window else wb)
            return (x, kp, vp), None

        A = jax.tree.leaves(k_pools)[0].shape[0]
        (x, k_pools, v_pools), _ = jax.lax.scan(
            body, (x, k_pools, v_pools),
            (blocks, wbounds, jnp.arange(A, dtype=jnp.int32)))
        return x, k_pools, v_pools

    store = cfg.attn_store_index
    attn_keys = set(_LLAMA_ATTN_KEYS) - ({"ln1"} if cfg.is_phi else set())
    for i in range(cfg.num_layers):
        j = store[i]
        bp = {}
        for kname, val in blocks.items():
            if _serve._base_key(kname) in attn_keys:
                if j is None:
                    continue
                bp[kname] = val[j]
            else:
                bp[kname] = val[i]
        wb = None if cfg.uniform_window else wbounds[i]
        if j is None:
            x, _, _ = call(x, bp, None, None, None, wb, has_attn=False)
        else:
            x, k_pools, v_pools = call(x, bp, k_pools, v_pools, j, wb)
    return x, k_pools, v_pools


def _chunk_prefill_layer(x, bp, kp_l, vp_l, cfg: LlamaConfig, page_table,
                         seq_len, compute_dtype, has_attn=True,
                         window_bound=None, *, chunk_start):
    """One layer of CHUNKED prefill: C tokens at global positions
    [chunk_start, chunk_start + C) attend over the whole paged cache
    (earlier chunks' keys ride the pages; in-chunk keys are written first,
    exactly like the decode path). One compiled shape serves any prompt
    length — the vLLM chunked-prefill memory model."""
    _, C, _ = x.shape
    ps = _page_size_of(kp_l)
    mp = page_table.shape[0]

    def attend(h):
        positions = chunk_start + jnp.arange(C)[None]           # [1, C]
        q, k, v = _block_qkv(h, bp, cfg, positions, compute_dtype)
        kp, vp = paged_cache_write_many(
            kp_l, vp_l, k[0], v[0], page_table, chunk_start,
            valid_len=jnp.maximum(seq_len - chunk_start, 0))
        def gather(pool):
            """Gather THIS sequence's mp pages before dequantizing — the
            int8 pool may hold many more pages than the page table maps."""
            if isinstance(pool, dict):
                codes = pool["q"][:, page_table].astype(jnp.float32)
                scales = pool["s"][:, page_table]
                out = (codes * scales[..., None]).astype(compute_dtype)
            else:
                out = pool[:, page_table]
            return out.reshape(cfg.num_kv_heads, mp * ps, cfg.head_dim)

        kf, vf = gather(kp), gather(vp)
        rep = cfg.num_heads // cfg.num_kv_heads
        if rep > 1:
            kf = jnp.repeat(kf, rep, axis=0)
            vf = jnp.repeat(vf, rep, axis=0)
        logits = jnp.einsum("qhd,hkd->hqk", q[0], kf,
                            preferred_element_type=jnp.float32) / cfg.head_dim**0.5
        if cfg.attn_softcap is not None:
            logits = cfg.attn_softcap * jnp.tanh(logits / cfg.attn_softcap)
        row = chunk_start + jnp.arange(C)[:, None]              # global q pos
        col = jnp.arange(mp * ps)[None, :]
        mask = (col <= row) & (col < seq_len)
        band = window_bound if window_bound is not None else cfg.sliding_window
        if band is not None:
            mask = mask & (row - col < band)
        logits = jnp.where(mask[None], logits, _NEG_INF)
        w = jax.nn.softmax(logits, axis=-1).astype(vf.dtype)
        attn = jnp.einsum("hqk,hkd->qhd", w, vf).reshape(1, C, -1)
        return _o_proj(attn, bp, compute_dtype), kp, vp

    if cfg.is_phi:
        h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
        delta = jnp.zeros_like(x)
        if has_attn:
            delta, kp_l, vp_l = attend(h)
        return x + delta + _mlp_branch(h, bp, cfg, compute_dtype), kp_l, vp_l

    if has_attn:
        attn, kp_l, vp_l = attend(rms_norm(x, bp["ln1"], cfg.rms_eps))
        if cfg.is_gemma2:
            attn = rms_norm(attn, bp["ln1_post"], cfg.rms_eps)
        x = x + attn
    h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
    mlp = _mlp_branch(h2, bp, cfg, compute_dtype)
    if cfg.is_gemma2:
        mlp = rms_norm(mlp, bp["ln2_post"], cfg.rms_eps)
    return x + mlp, kp_l, vp_l


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def paged_prefill_chunk(params: Params, tokens: jax.Array, k_pools, v_pools,
                        cfg: LlamaConfig, page_table: jax.Array,
                        chunk_start: jax.Array, seq_len: jax.Array):
    """One chunk ([1, C] tokens at global [chunk_start, chunk_start+C)) of a
    chunked prefill. Returns (logits at min(seq_len, chunk_start+C) - 1 [V],
    pools). ONE compile per chunk size C — prompt length only changes how
    many chunks the caller runs (bounded activation memory: O(C * mp*ps)
    logits instead of O(p_pad^2))."""
    compute_dtype = cache_compute_dtype(k_pools)
    C = tokens.shape[1]
    x = _embed_tokens(params, tokens, cfg, compute_dtype)
    layer_fn = functools.partial(_chunk_prefill_layer, chunk_start=chunk_start)
    x, k_pools, v_pools = _run_paged_layers(
        layer_fn, params, x, k_pools, v_pools, cfg, page_table, seq_len)
    last = jnp.clip(jnp.minimum(seq_len, chunk_start + C) - 1 - chunk_start,
                    0, C - 1)
    out = jax.lax.dynamic_slice_in_dim(x, last, 1, axis=1)
    logits = _final_logits(params, out, cfg, compute_dtype)[0, 0]
    return logits, k_pools, v_pools


def paged_prefill_chunked(params: Params, prompt, k_pools, v_pools,
                          cfg: LlamaConfig, page_table, *, chunk_size: int = 64,
                          start: int = 0):
    """Prefill one prompt through fixed-size chunks (see paged_prefill_chunk).
    Returns (next-token logits [V], pools). The logits come from the chunk
    containing the last prompt token. ``start`` skips tokens whose K/V the
    pages already hold (prefix caching) — must be page-aligned so writes
    never touch the shared pages."""
    prompt = np.asarray(prompt, np.int32).reshape(-1)
    n = len(prompt)
    seq_len = jnp.asarray(n, jnp.int32)
    logits = None
    for c0 in range(start, n, chunk_size):
        chunk = np.zeros((1, chunk_size), np.int32)
        chunk[0, : min(chunk_size, n - c0)] = prompt[c0: c0 + chunk_size]
        lg, k_pools, v_pools = paged_prefill_chunk(
            params, jnp.asarray(chunk), k_pools, v_pools, cfg,
            jnp.asarray(page_table), jnp.asarray(c0, jnp.int32), seq_len)
        if c0 <= n - 1 < c0 + chunk_size:
            logits = lg
    return logits, k_pools, v_pools


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def paged_prefill(params: Params, tokens: jax.Array, k_pools, v_pools,
                  cfg: LlamaConfig, page_table: jax.Array, seq_len: jax.Array):
    """One prompt ([1, p_pad] right-padded) -> pools filled, logits at the
    last valid position [V]. One compile per prompt bucket."""
    compute_dtype = cache_compute_dtype(k_pools)
    x = _embed_tokens(params, tokens, cfg, compute_dtype)
    x, k_pools, v_pools = _run_paged_layers(
        _prefill_layer, params, x, k_pools, v_pools, cfg, page_table, seq_len)
    last = jax.lax.dynamic_slice_in_dim(x, jnp.maximum(seq_len - 1, 0), 1, axis=1)
    logits = _final_logits(params, last, cfg, compute_dtype)[0, 0]
    return logits, k_pools, v_pools


def _paged_decode_body(params: Params, tokens: jax.Array, k_pools, v_pools,
                       cfg: LlamaConfig, page_tables: jax.Array,
                       seq_lens: jax.Array):
    compute_dtype = cache_compute_dtype(k_pools)
    x = _embed_tokens(params, tokens, cfg, compute_dtype)[:, None]   # [b, 1, d]
    x, k_pools, v_pools = _run_paged_layers(
        _paged_layer, params, x, k_pools, v_pools, cfg, page_tables, seq_lens)
    return _final_logits(params, x, cfg, compute_dtype)[:, 0], k_pools, v_pools


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def paged_decode_step(params: Params, tokens: jax.Array, k_pools, v_pools,
                      cfg: LlamaConfig, page_tables: jax.Array,
                      seq_lens: jax.Array):
    """One decode step for ALL slots: tokens [b] at per-sequence positions
    ``seq_lens`` (each sequence's own length — no shared write position).
    Returns (logits [b, V], pools)."""
    return _paged_decode_body(params, tokens, k_pools, v_pools, cfg,
                              page_tables, seq_lens)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"),
                   donate_argnums=(2, 3))
def paged_decode_scan(params: Params, first_tokens: jax.Array, k_pools, v_pools,
                      cfg: LlamaConfig, page_tables: jax.Array,
                      seq_lens: jax.Array, num_steps: int):
    """``num_steps`` greedy paged decode steps entirely on device (token
    feedback inside lax.scan) — ONE dispatch for the whole generation, the
    paged counterpart of serve.decode_scan. Page tables are fixed for the
    scan, so the caller must pre-own enough pages to cover
    ``seq_lens + num_steps`` (PagedServer.generate does). Returns
    (tokens [num_steps, b], pools)."""
    def step(carry, _):
        tok, kp, vp, lens = carry
        logits, kp, vp = _paged_decode_body(params, tok, kp, vp, cfg,
                                            page_tables, lens)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, kp, vp, lens + 1), nxt

    (_, k_pools, v_pools, _), toks = jax.lax.scan(
        step, (first_tokens, k_pools, v_pools, seq_lens), None, length=num_steps)
    return toks, k_pools, v_pools


def masked_decode_scan(body_fn, tokens, pools, page_tables, seq_lens, alive,
                       rem, eos_ids, num_steps: int, sampler_state=None):
    """``num_steps`` decode steps with PER-SLOT liveness in-graph — the
    continuous-batching counterpart of the fixed-horizon scans: a slot whose
    output token hits its eos or exhausts its remaining budget goes dead
    mid-scan (its page-table row is zeroed so further writes land on trash
    page 0, its length freezes, its emitted tokens read -1). ONE host
    dispatch therefore covers up to ``num_steps`` tokens per slot between
    admission points, amortizing the tunnel's 2-3 ms dispatch floor that
    bound the per-step server loop (docs/tpu_notes.md).

    ``body_fn(tok [b], pools, page_tables, seq_lens) -> (logits [b, V],
    pools)`` is the model family's decode body (llama pools pair here, the
    MLA latent pool in llm/paged_mla.py). Dead slots still run the body
    (their cost is masked work, not a branch) — a lax.cond skip would risk
    an identity-branch copy of the multi-GB pools every step.

    Returns (emits [num_steps, b] int32 with -1 for dead steps, pools,
    sampler_state)."""
    alive = alive.astype(jnp.bool_)

    def step(carry, _):
        tok, pools, lens, alive, rem, sstate = carry
        pt_step = jnp.where(alive[:, None], page_tables, 0)
        logits, pools = body_fn(tok, pools, pt_step, lens)
        if sstate is not None:
            from ssp_x_vit_tpu.llm.sampling import vectorized_sample

            nxt, sstate = vectorized_sample(logits, sstate)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emit = jnp.where(alive, nxt, -1)
        live_i = alive.astype(jnp.int32)
        lens = lens + live_i          # the K/V row this step just wrote
        rem = rem - live_i
        alive = alive & (nxt != eos_ids) & (rem > 0)
        return (nxt, pools, lens, alive, rem, sstate), emit

    (_, pools, _, _, _, sampler_state), emits = jax.lax.scan(
        step, (tokens, pools, seq_lens, alive, rem, sampler_state),
        None, length=num_steps)
    return emits, pools, sampler_state


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"),
                   donate_argnums=(2, 3))
def paged_decode_steps_masked(params: Params, tokens: jax.Array, k_pools,
                              v_pools, cfg: LlamaConfig,
                              page_tables: jax.Array, seq_lens: jax.Array,
                              alive: jax.Array, rem: jax.Array,
                              eos_ids: jax.Array, num_steps: int,
                              sampler_state=None):
    """Llama-family masked multi-step decode (see masked_decode_scan)."""
    def body(tok, pools, pts, lens):
        kp, vp = pools
        logits, kp, vp = _paged_decode_body(params, tok, kp, vp, cfg, pts,
                                            lens)
        return logits, (kp, vp)

    emits, (k_pools, v_pools), sampler_state = masked_decode_scan(
        body, tokens, (k_pools, v_pools), page_tables, seq_lens, alive, rem,
        eos_ids, num_steps, sampler_state)
    return emits, k_pools, v_pools, sampler_state


def paged_generate(params: Params, cfg: LlamaConfig, prompts, *,
                   max_new_tokens: int = 32, eos_token_id: Optional[int] = None,
                   page_size: int = 64, cache_dtype=jnp.bfloat16):
    """Bulk paged generation: prefill each prompt into its pages, then ONE
    on-device scan for the whole batch (greedy). Different prompt lengths
    decode at their own positions — no left padding. Returns a list of
    per-prompt token arrays (prompt + generation, trimmed at eos)."""
    prompts = [np.asarray(p).reshape(-1).astype(np.int32) for p in prompts]
    b = len(prompts)
    if max_new_tokens <= 0:
        return [p.copy() for p in prompts]
    mp = max(-(-(len(p) + max_new_tokens + 1) // page_size) for p in prompts)
    counts = [-(-(len(p) + max_new_tokens + 1) // page_size) for p in prompts]
    num_pages = 1 + sum(counts)
    k_pools, v_pools = init_paged_pools(cfg, num_pages, page_size, cache_dtype)

    pts = np.zeros((b, mp), np.int32)
    nxt_page = 1
    for i, c in enumerate(counts):
        pts[i, :c] = np.arange(nxt_page, nxt_page + c)
        nxt_page += c

    firsts = np.zeros((b,), np.int32)
    for i, p in enumerate(prompts):
        p_pad = min(bucket_prompt_pad(len(p)), mp * page_size)
        toks = np.zeros((1, p_pad), np.int32)
        toks[0, : len(p)] = p
        logits, k_pools, v_pools = paged_prefill(
            params, jnp.asarray(toks), k_pools, v_pools, cfg,
            jnp.asarray(pts[i]), jnp.asarray(len(p), jnp.int32))
        firsts[i] = int(np.argmax(np.asarray(logits)))

    lens = jnp.asarray([len(p) for p in prompts], jnp.int32)
    if max_new_tokens > 1:
        toks, _, _ = paged_decode_scan(
            params, jnp.asarray(firsts), k_pools, v_pools, cfg,
            jnp.asarray(pts), lens, max_new_tokens - 1)
        gen = np.concatenate([firsts[None], np.asarray(toks)], axis=0)  # [N, b]
    else:
        gen = firsts[None]

    outs = []
    for i, p in enumerate(prompts):
        seq = gen[:, i].tolist()
        if eos_token_id is not None and eos_token_id in seq:
            seq = seq[: seq.index(eos_token_id) + 1]
        outs.append(np.asarray(p.tolist() + seq, np.int32))
    return outs


@dataclasses.dataclass
class _Slot:
    active: bool = False
    request_id: int = -1
    pages: List[int] = dataclasses.field(default_factory=list)
    length: int = 0                      # tokens in cache
    last_token: int = 0
    generated: List[int] = dataclasses.field(default_factory=list)
    prompt: List[int] = dataclasses.field(default_factory=list)
    budget: int = 0
    eos: Optional[int] = None
    reserved: int = 0                    # worst-case pages held at admit


@functools.partial(jax.jit, donate_argnums=(1,))
def _sampler_step(logits, state):
    """Vectorized per-slot sampling over a decode step's [b, V] logits."""
    from ssp_x_vit_tpu.llm.sampling import vectorized_sample

    return vectorized_sample(logits, state)


@functools.partial(jax.jit, donate_argnums=(1,))
def _sampler_row_step(logits_row, state, i):
    """Admit-time first-token sampling for ONE slot: slice row ``i`` out of
    the state, run the same vectorized transform, write the row back."""
    from ssp_x_vit_tpu.llm.sampling import vectorized_sample

    row = jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, i, 1, axis=0), state)
    tok, row2 = vectorized_sample(logits_row, row)
    new_state = jax.tree.map(
        lambda x, r: jax.lax.dynamic_update_slice_in_dim(x, r, i, axis=0),
        state, row2)
    return tok[0], new_state


class PagedServer:
    """Continuous-batching greedy server over the paged pools.

    ``max_batch`` slots decode together each ``step()``; ``add_request``
    prefills into freshly allocated pages and joins the next step. Completed
    requests free their pages immediately. Raises if the pool cannot cover a
    request's worst case at admit time (simple admission control).

    ``prefix_cache=True`` enables AUTOMATIC PREFIX CACHING (the vLLM design):
    full pages of a prompt are registered under the hash of the token prefix
    they complete; a later prompt sharing that prefix reuses the pages
    (refcounted, read-only — decode writes only ever target a sequence's own
    tail/appended pages) and prefills only the remainder through the chunked
    path. Finished requests' registered pages stay cached (LRU) until pool
    pressure evicts them. Exact: shared pages hold identical K/V (same
    tokens, same absolute positions — and for int8 pools, the same
    per-token quantizer, hence identical codes)."""

    def __init__(self, params: Params, cfg: LlamaConfig, *, max_batch: int = 4,
                 num_pages: int = 128, page_size: int = 64,
                 max_context: int = 1024, cache_dtype=jnp.bfloat16,
                 chunked_prefill: Optional[int] = None,
                 prefix_cache: bool = False):
        self.params, self.cfg = params, cfg
        # per-request sampling (vLLM vectorized-sampler design): lazily
        # activated device state; None = every request greedy via host
        # argmax (the zero-overhead default).
        self.sampler_state = None
        self.page_size = page_size
        # chunked_prefill = C: admit prompts through fixed C-token chunks
        # (ONE compiled prefill shape for all prompt lengths, O(C * pages)
        # activation memory) instead of one whole-prompt bucket compile.
        self.chunked_prefill = chunked_prefill
        self.prefix_cache = prefix_cache
        self.max_pages_per_seq = -(-max_context // page_size)
        self._init_pools(num_pages, page_size, cache_dtype)
        self.free_pages = list(range(num_pages - 1, 0, -1))  # page 0 = trash
        self.slots = [_Slot() for _ in range(max_batch)]
        self._next_id = 0
        self.finished: Dict[int, np.ndarray] = {}
        # prefix-cache state: registered page <-> prefix-hash maps, active
        # refcounts, and an LRU of cached-but-unreferenced pages (evictable).
        self._registry: Dict[bytes, int] = {}  # prefix digest -> page id
        self._page_key: Dict[int, bytes] = {}  # page id -> prefix digest
        self._page_refs: Dict[int, int] = {}   # page id -> active slots
        self._lru: Dict[int, None] = {}        # insertion-ordered, evictable
        self.prefix_hit_pages = 0             # stat: pages served from cache

    # ---------------- model hooks ----------------
    # Everything model-specific lives in these three methods; the page
    # accounting, admission control, prefix cache, sampler, and decode loop
    # below are architecture-independent. MLAPagedServer (llm/paged_mla.py)
    # overrides them to serve DeepSeek's compressed-latent cache through the
    # same server.

    def _init_pools(self, num_pages: int, page_size: int, cache_dtype):
        self.k_pools, self.v_pools = init_paged_pools(
            self.cfg, num_pages, page_size, cache_dtype)

    def _prefill(self, prompt: List[int], pt: np.ndarray, m: int):
        """Prefill one prompt into its page table ``pt`` (the first ``m``
        pages already hold this prefix — prefix-cache hit); returns
        next-token logits [V]."""
        if self.chunked_prefill is not None or m > 0:
            # prefix reuse requires the offset-capable chunked path
            logits, self.k_pools, self.v_pools = paged_prefill_chunked(
                self.params, prompt, self.k_pools, self.v_pools, self.cfg,
                pt, chunk_size=self.chunked_prefill or 64,
                start=m * self.page_size)
        else:
            p_pad = min(bucket_prompt_pad(len(prompt)),
                        self.max_pages_per_seq * self.page_size)
            toks = np.zeros((1, p_pad), np.int32)
            toks[0, : len(prompt)] = prompt
            logits, self.k_pools, self.v_pools = paged_prefill(
                self.params, jnp.asarray(toks), self.k_pools, self.v_pools,
                self.cfg, jnp.asarray(pt), jnp.asarray(len(prompt), jnp.int32))
        return logits

    def _decode(self, tokens: np.ndarray, pts: np.ndarray, lens: np.ndarray):
        """One batched decode step (np [b], [b, mp], [b]) -> logits [b, V]."""
        logits, self.k_pools, self.v_pools = paged_decode_step(
            self.params, jnp.asarray(tokens), self.k_pools, self.v_pools,
            self.cfg, jnp.asarray(pts), jnp.asarray(lens))
        return logits

    def _decode_multi(self, tokens, pts, lens, alive, rem, eos,
                      num_steps: int):
        """``num_steps`` masked decode steps in ONE dispatch (np inputs);
        returns the emitted-token matrix [num_steps, b] (-1 = dead step)."""
        emits, self.k_pools, self.v_pools, self.sampler_state = \
            paged_decode_steps_masked(
                self.params, jnp.asarray(tokens), self.k_pools, self.v_pools,
                self.cfg, jnp.asarray(pts), jnp.asarray(lens),
                jnp.asarray(alive), jnp.asarray(rem), jnp.asarray(eos),
                num_steps, self.sampler_state)
        return emits

    # ---------------- page accounting ----------------

    def _alloc_page(self) -> int:
        if self.free_pages:
            return self.free_pages.pop()
        if self._lru:  # evict the least-recently-used cached prefix page
            pid = next(iter(self._lru))
            del self._lru[pid]
            del self._registry[self._page_key.pop(pid)]
            self._page_refs.pop(pid, None)
            return pid
        raise RuntimeError("page pool exhausted")

    def _release_page(self, pid: int):
        if pid in self._page_key:   # registered: stays cached, now evictable
            self._page_refs[pid] -= 1
            if self._page_refs[pid] == 0:
                self._lru[pid] = None  # re-inserted at MRU position
        else:
            self.free_pages.append(pid)

    def _prefix_keys(self, prompt):
        """Chained sha256 digests per full page: key_i = H(key_{i-1} ||
        tokens of page i). O(len) total (not O(len^2) re-hashes), and
        content-derived — a digest collision, unlike Python hash(), is not a
        realistic event, so cached pages can never silently serve a
        different prefix."""
        import hashlib

        ps = self.page_size
        keys, prev = [], b""
        for i in range(len(prompt) // ps):
            block = np.asarray(prompt[i * ps:(i + 1) * ps], np.int32).tobytes()
            prev = hashlib.sha256(prev + block).digest()
            keys.append(prev)
        return keys

    # ---------------- admission ----------------

    def add_request(self, prompt, max_new_tokens: int = 32,
                    eos_token_id: Optional[int] = None,
                    sampling=None, seed: Optional[int] = None) -> int:
        """``sampling`` (llm/sampling.SamplingParams) + ``seed`` select this
        REQUEST's decoding: requests with different temperatures/penalties/
        seeds decode together in one compiled step (traced [b] parameter
        vectors — admitting a new mixture never recompiles)."""
        prompt = [int(t) for t in np.asarray(prompt).reshape(-1)]
        slot = next((s for s in self.slots if not s.active), None)
        if slot is None:
            raise RuntimeError("no free slot")
        slot_idx = self.slots.index(slot)
        if (sampling is not None or seed is not None) and \
                self.sampler_state is None:
            from ssp_x_vit_tpu.llm.sampling import init_sampler_state

            # rows default to neutral (greedy, no penalties), so slots
            # admitted before activation keep their exact behavior
            self.sampler_state = init_sampler_state(
                len(self.slots), self.cfg.vocab_size)
        worst = -(-(len(prompt) + max_new_tokens) // self.page_size)
        if worst > self.max_pages_per_seq:
            raise ValueError("request exceeds max_context")

        keys = self._prefix_keys(prompt) if self.prefix_cache else []
        # reuse at most (len-1)//ps pages: at least one prompt token must
        # still run through the model to produce the first-token logits
        limit = (len(prompt) - 1) // self.page_size
        m = 0
        while m < min(len(keys), limit) and keys[m] in self._registry:
            m += 1

        # RESERVE the worst case: concurrent requests must never overcommit
        # the pool, or _ensure_page would fail unrecoverably mid-decode.
        # Unreserved = free + evictable-cache minus what active slots may
        # still claim. The m reused pages need no new allocation — but the
        # ones currently sitting in the LRU stop being evictable the moment
        # we take a reference, so they must NOT be counted as capacity.
        outstanding = sum(max(0, sl.reserved - len(sl.pages))
                          for sl in self.slots if sl.active)
        m_in_lru = sum(1 for i in range(m)
                       if self._registry[keys[i]] in self._lru)
        if worst - m > (len(self.free_pages) + len(self._lru) - m_in_lru
                        - outstanding):
            raise RuntimeError("page pool exhausted")

        reused = [self._registry[keys[i]] for i in range(m)]
        for pid in reused:
            if self._page_refs.get(pid, 0) == 0:
                self._lru.pop(pid, None)  # referenced again: not evictable
            self._page_refs[pid] = self._page_refs.get(pid, 0) + 1
        self.prefix_hit_pages += m

        n0 = -(-len(prompt) // self.page_size)
        pages = reused + [self._alloc_page() for _ in range(n0 - m)]
        pt = np.zeros((self.max_pages_per_seq,), np.int32)
        pt[: len(pages)] = pages

        logits = self._prefill(prompt, pt, m)
        if self.sampler_state is not None:
            # reset this slot's row (a lingering previous occupant's params
            # must never leak into a new request) and sample the first token
            # through the SAME transform the decode steps use
            from ssp_x_vit_tpu.llm.sampling import (SamplingParams,
                                                    slot_state_row)

            sp = sampling if sampling is not None else SamplingParams()
            self.sampler_state = slot_state_row(
                self.sampler_state, slot_idx, sp, prompt,
                self.cfg.vocab_size, seed)
            tok, self.sampler_state = _sampler_row_step(
                jnp.asarray(logits).reshape(1, -1), self.sampler_state,
                jnp.asarray(slot_idx, jnp.int32))
            first = int(tok)
        else:
            first = int(np.argmax(np.asarray(logits)))

        # register this prompt's freshly computed full-prefix pages
        for i in range(m, len(keys)):
            if keys[i] not in self._registry:
                self._registry[keys[i]] = pages[i]
                self._page_key[pages[i]] = keys[i]
                self._page_refs[pages[i]] = 1

        slot.active = True
        slot.request_id = self._next_id
        self._next_id += 1
        slot.pages = pages
        slot.length = len(prompt)
        slot.prompt = prompt
        slot.generated = [first]
        slot.last_token = first
        slot.budget = max_new_tokens
        slot.eos = eos_token_id
        slot.reserved = worst
        if eos_token_id is not None and first == eos_token_id:
            self._finish(slot)
        elif len(slot.generated) >= slot.budget:
            self._finish(slot)
        return slot.request_id

    # ---------------- decode loop ----------------

    def _ensure_page(self, slot: _Slot):
        need = slot.length // self.page_size  # page for the slot being written
        if need >= len(slot.pages):
            slot.pages.append(self._alloc_page())

    def _finish(self, slot: _Slot):
        self.finished[slot.request_id] = np.asarray(
            slot.prompt + slot.generated, np.int32)
        for pid in slot.pages:
            self._release_page(pid)
        slot.active = False
        slot.pages = []
        slot.reserved = 0

    def cancel(self, request_id: int) -> bool:
        """Abort an ACTIVE request: its tokens-so-far move to ``finished``
        and its pages are released immediately. Returns False when the id is
        not currently active (already finished or never admitted)."""
        for slot in self.slots:
            if slot.active and slot.request_id == request_id:
                self._finish(slot)
                return True
        return False

    def step(self) -> bool:
        """One batched decode step; returns False when no slot is active."""
        if not any(s.active for s in self.slots):
            return False
        b = len(self.slots)
        tokens = np.zeros((b,), np.int32)
        pts = np.zeros((b, self.max_pages_per_seq), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, s in enumerate(self.slots):
            if not s.active:
                continue  # trash-page writes, masked output
            self._ensure_page(s)
            tokens[i] = s.last_token
            pts[i, : len(s.pages)] = s.pages
            lens[i] = s.length

        logits = self._decode(tokens, pts, lens)
        if self.sampler_state is not None:
            # one compiled program for every slot mixture; greedy rows
            # (temperature 0) reduce to the same argmax as the host path
            toks, self.sampler_state = _sampler_step(logits,
                                                     self.sampler_state)
            nxt = np.asarray(toks)
        else:
            nxt = np.argmax(np.asarray(logits), axis=-1)

        for i, s in enumerate(self.slots):
            if not s.active:
                continue
            s.length += 1          # the token just written
            tok = int(nxt[i])
            s.generated.append(tok)
            s.last_token = tok
            if (s.eos is not None and tok == s.eos) or len(s.generated) >= s.budget:
                self._finish(s)
        return True

    def step_many(self, num_steps: int = 8) -> bool:
        """Up to ``num_steps`` decode steps for every active slot in ONE
        host dispatch (masked_decode_scan); returns False when no slot is
        active. Slots that finish mid-block (eos/budget) stop advancing
        in-graph; their pages are freed at reconcile. Admission happens
        between blocks, so ``num_steps`` bounds the join latency of a new
        request — the dispatch-floor amortization knob."""
        if not any(s.active for s in self.slots):
            return False
        if num_steps <= 1:
            return self.step()
        b = len(self.slots)
        tokens = np.zeros((b,), np.int32)
        pts = np.zeros((b, self.max_pages_per_seq), np.int32)
        lens = np.zeros((b,), np.int32)
        alive = np.zeros((b,), bool)
        rem = np.zeros((b,), np.int32)
        eos = np.full((b,), -1, np.int32)
        for i, s in enumerate(self.slots):
            if not s.active:
                continue
            steps_i = min(num_steps, s.budget - len(s.generated))
            # pre-own every page the next steps_i writes can touch — always
            # within the admit-time worst-case reservation, since
            # length + remaining budget <= len(prompt) + max_new_tokens
            while (s.length + steps_i - 1) // self.page_size >= len(s.pages):
                s.pages.append(self._alloc_page())
            tokens[i] = s.last_token
            pts[i, : len(s.pages)] = s.pages
            lens[i] = s.length
            alive[i] = True
            rem[i] = s.budget - len(s.generated)
            if s.eos is not None:
                eos[i] = s.eos
        emits = np.asarray(self._decode_multi(tokens, pts, lens, alive, rem,
                                              eos, num_steps))
        for i, s in enumerate(self.slots):
            if not s.active:
                continue
            for t in range(emits.shape[0]):
                tok = int(emits[t, i])
                if tok < 0:
                    break
                s.length += 1
                s.generated.append(tok)
                s.last_token = tok
                if (s.eos is not None and tok == s.eos) or \
                        len(s.generated) >= s.budget:
                    self._finish(s)
                    break
        return True

    def run(self, decode_block: int = 8) -> Dict[int, np.ndarray]:
        while self.step_many(decode_block):
            pass
        return self.finished
