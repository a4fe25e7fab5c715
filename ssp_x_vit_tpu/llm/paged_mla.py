"""Paged serving for the MLA (DeepSeek-V3) family: compressed-latent pages.

The MLA serving cache per token per layer is ONE head-independent vector —
the post-norm compressed latent ``c`` [kv_lora_rank] plus the shared roped
key ``k_rot`` [qk_rope_head_dim] (llm/deepseek.py module docstring). Paging
that cache therefore needs a SINGLE pool of ``cat(c, k_rot)`` vectors
per layer, not a K/V pool pair:

    pool: [L, 1, num_pages, page_size, kv_lora_rank + qk_rope_head_dim]

(the explicit nkv=1 axis keeps the ops-layer page-walk contract intact).

Absorbed decode maps EXACTLY onto the existing paged-attention kernel
(ops/pallas/paged_attention.py) as 1-kv-head attention:

- query: ``q_cat = cat(q_nope @ W_k^T, q_rot)`` [b, nq, kvr+rd] — the
  absorbed query scores against cached ``cat(c, k_rot)`` directly
  (the two einsums of deepseek._absorbed_decode_attention are one dot
  over the concatenated axis);
- keys AND values: the SAME pool. ``probs @ cat(c, kr)`` equals
  ``cat(probs @ c, probs @ kr)``, so slicing the kernel output to the
  first kv_lora_rank dims yields the compressed-space context exactly;
- scale: the kernel scales by ``1/sqrt(kvr+rd)``; pre-multiplying q_cat by
  ``sqrt(kvr+rd) * mla_softmax_scale(cfg)`` restores MLA's softmax scale
  (``1/sqrt(qk_head_dim)``, times the yarn mscale temperature when scaled).

So the scalar-prefetch page-walk kernel, the jnp reference, the int8-pool
variants, and the dispatch gate all serve MLA with zero new kernel code —
and each page step streams ``ps * (kvr+rd)`` floats once for all heads
(vs ``2 * nkv * ps * hd`` in MHA/GQA pools).

:class:`MLAPagedServer` subclasses :class:`~ssp_x_vit_tpu.llm.paged.PagedServer`,
overriding only its three model hooks — page accounting, admission control,
continuous batching, per-request sampling, and cancel/step/run are shared,
and the OpenAI-compatible frontend (llm/engine.py + llm/server_http.py)
serves MLA models unchanged.

The reference framework has no serving machinery and tops out at the
Llama generation (``/root/reference/src/slicegpt.py:16-31``); this is part
of the rebuild's beyond-reference serving subsystem.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.deepseek import (
    DeepseekConfig, Params, _apply_rope, _deepseek_moe, _glu, _head_logits,
    _kv_b_matrix, _mla_compressed, _mla_q, _mm, _rms, _rope_tables,
    deepseek_forward, mla_softmax_scale,
)
from ssp_x_vit_tpu.llm.paged import _NEG_INF, PagedServer
from ssp_x_vit_tpu.llm.serve import bucket_prompt_pad
from ssp_x_vit_tpu.ops.pallas.paged_attention import (
    _quantize_token_kv, paged_attention, paged_pool_write,
    paged_pool_write_many,
)

__all__ = ["MLAPagedServer", "init_mla_pool", "mla_paged_prefill",
           "mla_prefill_chunk", "mla_paged_prefill_chunked",
           "mla_paged_decode_step", "mla_paged_generate"]


def init_mla_pool(cfg: DeepseekConfig, num_pages: int, page_size: int,
                  dtype=jnp.bfloat16):
    """[L, 1, num_pages, page_size, kv_lora_rank + qk_rope_head_dim]
    (page 0 reserved as trash, cf. paged.init_paged_pools). ``int8``
    returns the quantized-pool pytree {"q": codes, "s": per-token f32
    scales} — the same contract the generic page-walk kernel folds
    (llm/paged.init_paged_pools); the scale covers the WHOLE cat(c, k_rot)
    vector, and the context-slice identity survives quantization because
    dequantization is per-token elementwise (linearity argument above)."""
    shape = (cfg.num_layers, 1, num_pages, page_size,
             cfg.kv_lora_rank + cfg.qk_rope_head_dim)
    if dtype == jnp.int8:
        return {"q": jnp.zeros(shape, jnp.int8),
                "s": jnp.ones(shape[:-1], jnp.float32)}
    return jnp.zeros(shape, dtype)


def _pool_compute_dtype(pool):
    if isinstance(pool, dict):
        return jnp.bfloat16
    return jnp.float32 if pool.dtype == jnp.float32 else jnp.bfloat16


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def mla_paged_prefill(params: Params, tokens: jax.Array, pool,
                      cfg: DeepseekConfig, page_table: jax.Array,
                      seq_len: jax.Array):
    """One prompt ([1, p_pad] right-padded) -> (next-token logits [V],
    pool). The full forward emits every layer's (c, k_rot) as a side
    output (deepseek_forward return_caches); padded positions land on
    trash page 0. One compile per prompt bucket."""
    dt = _pool_compute_dtype(pool)
    logits, (c, kr) = deepseek_forward(
        params, tokens, cfg, compute_dtype=dt, return_caches=True,
        logit_position=jnp.maximum(seq_len - 1, 0))
    cat = jnp.concatenate([c, kr], axis=-1)[:, 0]             # [L, s, D]
    s = tokens.shape[1]
    ps = (pool["q"] if isinstance(pool, dict) else pool).shape[3]
    pos = jnp.arange(s)
    phys = jnp.where(pos < seq_len, page_table[pos // ps], 0)
    if isinstance(pool, dict):
        codes, sc = _quantize_token_kv(cat)                   # [L,s,D],[L,s]
        pool = {"q": pool["q"].at[:, :, phys, pos % ps].set(codes[:, None]),
                "s": pool["s"].at[:, :, phys, pos % ps].set(sc[:, None])}
    else:
        pool = pool.at[:, :, phys, pos % ps].set(
            cat[:, None].astype(pool.dtype))
    return logits[0, 0], pool


def _gather_latents(pool_l, page_table, dt):
    """ONE sequence's mp mapped pages -> [mp*ps, D] latent rows in compute
    dtype (dequantized for int8 pools); gather BEFORE dequantizing — the
    pool may hold many more pages than the table maps."""
    if isinstance(pool_l, dict):
        codes = pool_l["q"][:, page_table].astype(jnp.float32)
        scales = pool_l["s"][:, page_table]
        out = (codes * scales[..., None]).astype(dt)
    else:
        out = pool_l[:, page_table].astype(dt)
    return out.reshape(-1, out.shape[-1])                     # nkv=1 folded


def _mla_chunk_attention(h, bp, cfg: DeepseekConfig, dt, pool_l, page_table,
                         seq_len, chunk_start, cos, sin, layer_idx=None):
    """One layer of CHUNKED MLA prefill: C tokens at global positions
    [chunk_start, chunk_start + C) attend over the whole latent page pool
    (earlier chunks' latents ride the pages; this chunk's are written
    first, exactly like the decode path — the vLLM chunked-prefill memory
    model of paged._chunk_prefill_layer, in compressed space). h [1, C, d]
    post-ln1; cos/sin [C, rd] at the global positions. Returns
    (attn_out [1, C, d], updated pool_l)."""
    C = h.shape[1]
    nq, kvr = cfg.num_heads, cfg.kv_lora_rank
    nope, vd = cfg.qk_nope_head_dim, cfg.v_head_dim

    q = _mla_q(h, bp, cfg, dt)                                # [1, nq, C, qk]
    q_nope, q_rot = jnp.split(q, [nope], axis=-1)
    q_rot = _apply_rope(q_rot, cos[None, None], sin[None, None],
                        cfg.rope_interleave)

    c_new, kr_raw = _mla_compressed(h, bp, cfg, dt)           # [1, C, ·]
    kr_new = _apply_rope(kr_raw, cos[None], sin[None], cfg.rope_interleave)
    vec = jnp.concatenate([c_new, kr_new], axis=-1)[0][:, None]  # [C, 1, D]
    pool_l = paged_pool_write_many(
        pool_l, vec, page_table, chunk_start,
        valid_len=jnp.maximum(seq_len - chunk_start, 0),
        layer_idx=layer_idx)

    wkv = _kv_b_matrix(bp, dt).reshape(kvr, nq, nope + vd)
    q_c = jnp.einsum("bhcn,rhn->bhcr", q_nope, wkv[:, :, :nope],
                     preferred_element_type=jnp.float32).astype(dt)
    q_cat = jnp.concatenate([q_c, q_rot], axis=-1)            # [1, nq, C, D]

    from ssp_x_vit_tpu.ops.pallas.paged_attention import _layer_of

    lat = _gather_latents(_layer_of(pool_l, layer_idx), page_table, dt)
    scores = jnp.einsum("hcD,kD->hck", q_cat[0], lat,
                        preferred_element_type=jnp.float32)
    scores = scores * mla_softmax_scale(cfg)
    row = chunk_start + jnp.arange(C)[:, None]                # global q pos
    col = jnp.arange(lat.shape[0])[None, :]
    mask = (col <= row) & (col < seq_len)
    scores = jnp.where(mask[None], scores, _NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("hck,kD->hcD", w.astype(lat.dtype), lat,
                     preferred_element_type=jnp.float32).astype(dt)
    ctx_c = ctx[..., :kvr]                                    # [nq, C, kvr]
    out = jnp.einsum("hcr,rhv->chv", ctx_c, wkv[:, :, nope:],
                     preferred_element_type=jnp.float32).astype(dt)
    out = _mm(out.reshape(C, nq * vd), bp, "o_kernel", dt)
    return out[None], pool_l


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def mla_prefill_chunk(params: Params, tokens: jax.Array, pool,
                      cfg: DeepseekConfig, page_table: jax.Array,
                      chunk_start: jax.Array, seq_len: jax.Array):
    """One chunk ([1, C] tokens at global [chunk_start, chunk_start+C)) of
    a chunked MLA prefill. Returns (logits at min(seq_len, chunk_start+C)
    - 1 [V], pool). ONE compile per chunk size C; O(C * mp*ps) score
    memory instead of O(p_pad^2)."""
    dt = _pool_compute_dtype(pool)
    C = tokens.shape[1]
    x = params["embed"].astype(dt)[tokens]                    # [1, C, d]
    positions = chunk_start + jnp.arange(C)
    cos, sin = _rope_tables(cfg, positions)                   # [C, rd]
    nk = cfg.n_dense_layers

    # full pool as carry, layer rows addressed by index (cf. _mla_decode_body)
    def run_group(x, pool, blocks, moe, offset, n):
        def body(carry, scanned):
            x, pool = carry
            bp, li = scanned
            h = _rms(x, bp["ln1"], cfg.rms_eps)
            attn, pool = _mla_chunk_attention(
                h, bp, cfg, dt, pool, page_table, seq_len, chunk_start,
                cos, sin, layer_idx=li)
            x = x + attn
            h2 = _rms(x, bp["ln2"], cfg.rms_eps)
            if moe:
                mlp = _deepseek_moe(h2, bp, cfg, dt)
            else:
                mlp = _glu(h2, bp, dt)
            return (x + mlp, pool), None

        (x, pool), _ = jax.lax.scan(
            body, (x, pool),
            (blocks, offset + jnp.arange(n, dtype=jnp.int32)))
        return x, pool

    if nk:
        x, pool = run_group(x, pool, params["dense_blocks"], False, 0, nk)
    if cfg.n_moe_layers:
        x, pool = run_group(x, pool, params["moe_blocks"], True, nk,
                            cfg.n_moe_layers)

    x = _rms(x, params["ln_final"], cfg.rms_eps)
    last = jnp.clip(jnp.minimum(seq_len, chunk_start + C) - 1 - chunk_start,
                    0, C - 1)
    out = jax.lax.dynamic_slice_in_dim(x, last, 1, axis=1)[:, 0]  # [1, d]
    logits = _head_logits(out, params, dt)
    return logits[0], pool


def mla_paged_prefill_chunked(params: Params, prompt, pool,
                              cfg: DeepseekConfig, page_table, *,
                              chunk_size: int = 64, start: int = 0):
    """Prefill one prompt through fixed-size chunks (mla_prefill_chunk).
    Returns (next-token logits [V], pool). ``start`` skips tokens whose
    latents the pages already hold (prefix caching — exact: latents are a
    function of the token prefix and absolute positions only, and for int8
    pools the per-token quantizer is content-derived too, so shared pages
    hold identical codes). Must be page-aligned."""
    prompt = np.asarray(prompt, np.int32).reshape(-1)
    n = len(prompt)
    seq_len = jnp.asarray(n, jnp.int32)
    logits = None
    for c0 in range(start, n, chunk_size):
        chunk = np.zeros((1, chunk_size), np.int32)
        chunk[0, : min(chunk_size, n - c0)] = prompt[c0: c0 + chunk_size]
        lg, pool = mla_prefill_chunk(
            params, jnp.asarray(chunk), pool, cfg, jnp.asarray(page_table),
            jnp.asarray(c0, jnp.int32), seq_len)
        if c0 <= n - 1 < c0 + chunk_size:
            logits = lg
    return logits, pool


def _absorbed_paged_attention(h, bp, cfg: DeepseekConfig, dt, pool_l,
                              page_tables, seq_lens, cos, sin,
                              layer_idx=None):
    """One decode position per slot against the latent pool (see module
    docstring for the kernel-reuse argument). h [b, d] post-ln1; cos/sin
    [b, rd] at each slot's own position. Returns (attn_out [b, d],
    updated pool_l). ``layer_idx`` (traced) addresses this layer's row of
    the FULL latent pool — the decode scan carries the whole pool and the
    pallas kernels write/read it in place (cf. paged._run_paged_layers)."""
    b = h.shape[0]
    nq, kvr = cfg.num_heads, cfg.kv_lora_rank
    nope, vd = cfg.qk_nope_head_dim, cfg.v_head_dim
    D = kvr + cfg.qk_rope_head_dim

    q = _mla_q(h[:, None], bp, cfg, dt)[:, :, 0]              # [b, nq, qk]
    q_nope, q_rot = jnp.split(q, [nope], axis=-1)
    q_rot = _apply_rope(q_rot, cos[:, None], sin[:, None], cfg.rope_interleave)

    c_new, kr_raw = _mla_compressed(h[:, None], bp, cfg, dt)  # [b, 1, ·]
    kr_new = _apply_rope(kr_raw, cos[:, None], sin[:, None],
                         cfg.rope_interleave)
    vec = jnp.concatenate([c_new, kr_new], axis=-1)           # [b, 1, D]
    pool_l = paged_pool_write(pool_l, vec, page_tables, seq_lens,
                              layer_idx=layer_idx)

    wkv = _kv_b_matrix(bp, dt).reshape(kvr, nq, nope + vd)
    q_c = jnp.einsum("bhn,rhn->bhr", q_nope, wkv[:, :, :nope],
                     preferred_element_type=jnp.float32).astype(dt)
    q_cat = jnp.concatenate([q_c, q_rot], axis=-1)            # [b, nq, D]
    # kernel divides by sqrt(D); MLA wants mla_softmax_scale (1/sqrt(
    # qk_head_dim), times the yarn mscale_all_dim temperature when scaled)
    q_cat = q_cat * (D ** 0.5 * mla_softmax_scale(cfg))
    ctx = paged_attention(q_cat, pool_l, pool_l, page_tables, seq_lens + 1,
                          layer_idx=layer_idx)
    ctx_c = ctx[..., :kvr]                                    # [b, nq, kvr]
    out = jnp.einsum("bhr,rhv->bhv", ctx_c.astype(dt), wkv[:, :, nope:],
                     preferred_element_type=jnp.float32).astype(dt)
    return _mm(out.reshape(b, nq * vd), bp, "o_kernel", dt), pool_l


def _mla_decode_body(params: Params, tokens: jax.Array, pool,
                     cfg: DeepseekConfig, page_tables: jax.Array,
                     seq_lens: jax.Array):
    """One decode step for ALL slots: tokens [b] at per-sequence positions
    ``seq_lens``. Returns (logits [b, V], pool). Layers scan in the same
    two homogeneous groups as deepseek_forward."""
    dt = _pool_compute_dtype(pool)
    x = params["embed"].astype(dt)[tokens]                    # [b, d]
    cos, sin = _rope_tables(cfg, seq_lens)                    # [b, rd]
    nk = cfg.n_dense_layers

    # the FULL pool rides the scans as CARRY (layer rows addressed in place
    # by the layer-indexed pallas kernels) — NOT as scanned xs/ys, which
    # would re-materialize a full layer-pool copy per step, and NOT
    # group-sliced/concatenated, which copied the whole pool twice more
    # (cf. paged._run_paged_layers; measured in scripts/bench_paged_gap.py)
    def run_group(x, pool, blocks, moe, offset, n):
        def body(carry, scanned):
            x, pool = carry
            bp, li = scanned
            h = _rms(x, bp["ln1"], cfg.rms_eps)
            attn, pool = _absorbed_paged_attention(
                h, bp, cfg, dt, pool, page_tables, seq_lens, cos, sin,
                layer_idx=li)
            x = x + attn
            h2 = _rms(x, bp["ln2"], cfg.rms_eps)
            if moe:
                mlp = _deepseek_moe(h2[:, None], bp, cfg, dt)[:, 0]
            else:
                mlp = _glu(h2, bp, dt)
            return (x + mlp, pool), None

        (x, pool), _ = jax.lax.scan(
            body, (x, pool),
            (blocks, offset + jnp.arange(n, dtype=jnp.int32)))
        return x, pool

    if nk:
        x, pool = run_group(x, pool, params["dense_blocks"], False, 0, nk)
    if cfg.n_moe_layers:
        x, pool = run_group(x, pool, params["moe_blocks"], True, nk,
                            cfg.n_moe_layers)

    x = _rms(x, params["ln_final"], cfg.rms_eps)
    logits = _head_logits(x, params, dt)
    return logits, pool


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def mla_paged_decode_step(params: Params, tokens: jax.Array, pool,
                          cfg: DeepseekConfig, page_tables: jax.Array,
                          seq_lens: jax.Array):
    """Jitted single-step entry over :func:`_mla_decode_body`."""
    return _mla_decode_body(params, tokens, pool, cfg, page_tables, seq_lens)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"),
                   donate_argnums=(2,))
def mla_paged_decode_steps_masked(params: Params, tokens: jax.Array, pool,
                                  cfg: DeepseekConfig,
                                  page_tables: jax.Array, seq_lens: jax.Array,
                                  alive: jax.Array, rem: jax.Array,
                                  eos_ids: jax.Array, num_steps: int,
                                  sampler_state=None):
    """MLA masked multi-step decode (see paged.masked_decode_scan)."""
    from ssp_x_vit_tpu.llm.paged import masked_decode_scan

    def body(tok, pool, pts, lens):
        return _mla_decode_body(params, tok, pool, cfg, pts, lens)

    return masked_decode_scan(body, tokens, pool, page_tables, seq_lens,
                              alive, rem, eos_ids, num_steps, sampler_state)


class MLAPagedServer(PagedServer):
    """Continuous-batching server over the compressed-latent page pool.

    Inherits the whole serving machinery from :class:`PagedServer` (slots,
    admission with worst-case reservation, cancel, per-request sampling,
    step loop) — only the three model hooks differ. Works under
    :class:`~ssp_x_vit_tpu.llm.engine.ServingEngine` and the HTTP frontend.

    ``cache_dtype=jnp.int8`` stores the latent pool quantized (per-token
    symmetric scales over the whole cat(c, k_rot) vector; the generic
    kernel folds the scales) — halving the already head-count-independent
    cache bytes. ``chunked_prefill``/``prefix_cache`` ride the base
    server's machinery over :func:`mla_paged_prefill_chunked` (offset-aware
    chunk prefill in compressed space): the prefix-cache exactness argument
    holds because latents are a function of the token prefix and absolute
    positions only.
    """

    def __init__(self, params: Params, cfg: DeepseekConfig, *,
                 max_batch: int = 4, num_pages: int = 128,
                 page_size: int = 64, max_context: int = 1024,
                 cache_dtype=jnp.bfloat16,
                 chunked_prefill: Optional[int] = None,
                 prefix_cache: bool = False):
        if isinstance(cache_dtype, dict):
            raise ValueError("MLA stores ONE latent pool; per-K/V dtype "
                             "dicts do not apply — pass jnp.int8 directly")
        if cfg.pruned_attention_blocks:
            raise ValueError(
                "paged MLA serving rides the uniform scan-group layout; "
                "attention-materialized models serve through "
                "deepseek_generate (contiguous cache) instead")
        super().__init__(params, cfg, max_batch=max_batch,
                         num_pages=num_pages, page_size=page_size,
                         max_context=max_context, cache_dtype=cache_dtype,
                         chunked_prefill=chunked_prefill,
                         prefix_cache=prefix_cache)

    # ---------------- model hooks ----------------

    def _init_pools(self, num_pages: int, page_size: int, cache_dtype):
        self.pool = init_mla_pool(self.cfg, num_pages, page_size, cache_dtype)

    def _prefill(self, prompt: List[int], pt: np.ndarray, m: int):
        if self.chunked_prefill is not None or m > 0:
            # prefix reuse requires the offset-capable chunked path
            logits, self.pool = mla_paged_prefill_chunked(
                self.params, prompt, self.pool, self.cfg, pt,
                chunk_size=self.chunked_prefill or 64,
                start=m * self.page_size)
            return logits
        p_pad = min(bucket_prompt_pad(len(prompt)),
                    self.max_pages_per_seq * self.page_size)
        toks = np.zeros((1, p_pad), np.int32)
        toks[0, : len(prompt)] = prompt
        logits, self.pool = mla_paged_prefill(
            self.params, jnp.asarray(toks), self.pool, self.cfg,
            jnp.asarray(pt), jnp.asarray(len(prompt), jnp.int32))
        return logits

    def _decode(self, tokens: np.ndarray, pts: np.ndarray, lens: np.ndarray):
        logits, self.pool = mla_paged_decode_step(
            self.params, jnp.asarray(tokens), self.pool, self.cfg,
            jnp.asarray(pts), jnp.asarray(lens))
        return logits

    def _decode_multi(self, tokens, pts, lens, alive, rem, eos,
                      num_steps: int):
        emits, self.pool, self.sampler_state = mla_paged_decode_steps_masked(
            self.params, jnp.asarray(tokens), self.pool, self.cfg,
            jnp.asarray(pts), jnp.asarray(lens), jnp.asarray(alive),
            jnp.asarray(rem), jnp.asarray(eos), num_steps,
            self.sampler_state)
        return emits


def mla_paged_generate(params: Params, cfg: DeepseekConfig, prompts, *,
                       max_new_tokens: int = 32,
                       eos_token_id: Optional[int] = None,
                       page_size: int = 64, cache_dtype=jnp.bfloat16,
                       max_batch: Optional[int] = None):
    """Bulk MLA paged generation (ragged prompts, continuous batching).
    Returns per-prompt arrays (prompt + generation, trimmed at eos) in
    input order — the paged counterpart of deepseek_generate."""
    prompts = [np.asarray(p).reshape(-1).astype(np.int32) for p in prompts]
    counts = [-(-(len(p) + max_new_tokens + 1) // page_size) for p in prompts]
    srv = MLAPagedServer(
        params, cfg, max_batch=max_batch or len(prompts),
        num_pages=1 + sum(counts), page_size=page_size,
        max_context=max(len(p) + max_new_tokens + 1 for p in prompts),
        cache_dtype=cache_dtype)
    ids = [srv.add_request(p, max_new_tokens=max_new_tokens,
                           eos_token_id=eos_token_id) for p in prompts]
    finished = srv.run()
    return [finished[i] for i in ids]
