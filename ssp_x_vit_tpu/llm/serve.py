"""KV-cached autoregressive decoding (serving path).

The reference's generation recomputes the full sequence every step
(HF generate on a research box); for production serving this module provides
the TPU-native incremental path: a static-shape KV cache ([L_attn, b, max_len,
n_kv, head_dim]), one compiled prefill and one compiled decode step (cache
donated, position-indexed updates via dynamic_update_slice) — zero retraces
for any prompt/generation length up to the bucket size.

Batching uses LEFT-padded prompts: all sequences share one global write
position (donation-friendly ``dynamic_update_slice``), per-sequence rotary
positions subtract the pad length, and the attention mask excludes pad slots
(``key >= pad_len[i]``). Prompt-length buckets keep the number of compiled
prefill shapes small without padding every prompt to ``max_length``.

Covers dense llama-layout models (llama/mistral/qwen2/phi-3), phi-2's
parallel-residual block (partial rotary, LayerNorm, biases), OPT's sequential
LayerNorm block (learned absolute positions at pad-corrected cache indices,
ReLU MLP, biased projections; reference adapters/opt_adapter.py), width-pruned
(uniform stacked scan) and depth-materialized models (attention physically
absent in pruned blocks -> unrolled layer loop, cache rows only for surviving
attention, cf. llama_forward_materialized).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import (
    LlamaConfig, Params, _embed_tokens, _glu_act, _layer_norm, _mm, rms_norm,
)

PROMPT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def bucket_prompt_pad(n: int, buckets: Sequence[int] = PROMPT_BUCKETS) -> int:
    """Smallest bucket >= n (rounding up to a multiple of 128 past the table),
    so a handful of compiled prefill shapes serves any prompt length."""
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 128) * 128


def _rope_at(q, k, positions, cfg: LlamaConfig):
    """Rotary embedding at per-sequence positions. q/k: [b, s, h, hd];
    positions [b, s]. ``cfg.rotary_dim`` rotates only the first dims (phi-2);
    ``cfg.rope_scaling`` (llama3/yarn/linear) corrects the frequencies —
    shared with the full forward via llm/rope.py so cached decode stays
    exactly equal to recompute."""
    from ssp_x_vit_tpu.llm.rope import rope_freqs

    hd = q.shape[-1]
    rotary_dim = cfg.rotary_dim
    rd = rotary_dim if (rotary_dim is not None and rotary_dim < hd) else hd
    inv_freq_np, attn_scale = rope_freqs(cfg.rope_theta, rd, cfg.rope_scaling)
    inv_freq = jnp.asarray(inv_freq_np)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [b, s, rd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)               # [b, s, rd]
    cos = (jnp.cos(emb) * attn_scale)[:, :, None, :]
    sin = (jnp.sin(emb) * attn_scale)[:, :, None, :]

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    def apply(x):
        xr = x[..., :rd].astype(jnp.float32)
        out = (xr * cos + rot(xr) * sin).astype(x.dtype)
        return out if rd == hd else jnp.concatenate([out, x[..., rd:]], axis=-1)

    return apply(q), apply(k)


def num_attn_layers(cfg: LlamaConfig) -> int:
    return cfg.num_layers - len(cfg.pruned_attention_blocks)


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """KV cache [A, b, max_len, nkv, hd] x2. ``dtype=jnp.int8`` selects the
    QUANTIZED cache: each array becomes a pytree {"q": int8 codes,
    "s": f32 per-token-per-head scales [A, b, max_len, nkv]} — jit, scan,
    donation and the layer loops handle the dict transparently. Compute stays
    bf16; only the cache bytes (the long-context HBM stream) halve."""
    shape = (num_attn_layers(cfg), batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if dtype == jnp.int8:
        def mk():
            return {"q": jnp.zeros(shape, jnp.int8),
                    "s": jnp.ones(shape[:-1], jnp.float32)}
        return mk(), mk()
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def init_rolling_cache(cfg: LlamaConfig, batch: int, dtype=jnp.bfloat16):
    """ROLLING cache for sliding-window models: exactly ``sliding_window``
    slots per layer (slot = global position mod window) instead of
    ``max_len`` — cache memory is bounded by the window no matter how long
    the generation runs (the mistral serving memory model). Requires
    ``cfg.sliding_window``; llama-layout only (OPT has no window)."""
    if cfg.sliding_window is None:
        raise ValueError("rolling cache requires cfg.sliding_window")
    if not cfg.uniform_window:
        raise ValueError("rolling cache requires a UNIFORM window: mixed "
                         "configs have full-attention layers whose keys "
                         "never expire")
    if cfg.is_opt:
        raise ValueError("rolling cache covers llama-layout/phi models")
    return init_cache(cfg, batch, cfg.sliding_window, dtype)


def cache_compute_dtype(ck):
    """Activation dtype implied by a cache leaf (int8 caches compute bf16)."""
    return jnp.bfloat16 if isinstance(ck, dict) else ck.dtype


def _block_qkv(x, bp, cfg: LlamaConfig, positions, compute_dtype,
                lora_ids=None):
    """positions: [b, s] per-sequence rotary positions. ``lora_ids`` [b]
    selects each row's adapter from attached multi-LoRA bank slices
    (llm/multilora.py); None or absent bank keys = base projections."""
    b, s, _ = x.shape
    if any(k.startswith("qkv_kernel") for k in bp):
        # pack_llm_params_for_serving fused the three projections into ONE
        # matmul (decode is per-op-overhead/bandwidth bound: one [d, hq+2hkv]
        # dot streams better than three)
        qkv = _mm(x, bp, "qkv_kernel", compute_dtype)
        hq = cfg.num_heads * cfg.head_dim
        hkv = cfg.num_kv_heads * cfg.head_dim
        q, k, v = jnp.split(qkv, (hq, hq + hkv), axis=-1)
    else:
        q = _mm(x, bp, "q_kernel", compute_dtype)
        k = _mm(x, bp, "k_kernel", compute_dtype)
        v = _mm(x, bp, "v_kernel", compute_dtype)
    if lora_ids is not None:
        from ssp_x_vit_tpu.llm.multilora import lora_delta

        for name, t in (("q", "q_kernel"), ("k", "k_kernel"), ("v", "v_kernel")):
            d = lora_delta(x, bp, t, lora_ids, compute_dtype)
            if d is not None:
                if name == "q":
                    q = q + d
                elif name == "k":
                    k = k + d
                else:
                    v = v + d
    if "q_bias" in bp:
        q = q + bp["q_bias"].astype(compute_dtype)
        k = k + bp["k_bias"].astype(compute_dtype)
        v = v + bp["v_bias"].astype(compute_dtype)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:  # qwen3: per-head RMSNorm over head_dim before rope
        q = rms_norm(q, bp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, bp["k_norm"], cfg.rms_eps)
    if not cfg.is_opt:  # OPT: learned absolute positions at the embedding
        q, k = _rope_at(q, k, positions, cfg)
    return q, k, v


def _proj_o(attn, bp, compute_dtype, lora_ids=None):
    """o-projection + optional per-row multi-LoRA delta (no bias here —
    callers add arch-specific biases)."""
    out = _mm(attn, bp, "o_kernel", compute_dtype)
    if lora_ids is not None:
        from ssp_x_vit_tpu.llm.multilora import lora_delta

        d = lora_delta(attn, bp, "o_kernel", lora_ids, compute_dtype)
        if d is not None:
            out = out + d
    return out


def _attend_cached(q, ck, cv, query_positions, pad_lens, cfg: LlamaConfig,
                   rolling: Optional[int] = None, window_bound=None):
    """q [b, s_q, h, hd] over cached k/v [b, max_len, nkv, hd]; query at global
    index g attends keys with pad_len[i] <= key_index <= g (left-pad masked).

    ``rolling`` = slot count W of a ROLLING cache (sliding-window models,
    cf. init_rolling_cache): slot s holds the key with global index
    g - ((g - s) mod W) — the newest index congruent to s that is <= g. The
    window bound is implicit (all retained keys are within W = window of g);
    only the left-pad/unwritten-slot validity needs masking.

    int8 caches ({"q","s"} pytrees): per-token-per-head scales commute with
    the hd contraction, so they fold into epilogues — key scales multiply the
    LOGITS, value scales fold into the softmax weights before the v-einsum.
    The einsum operands stay a bare int8->bf16 convert (fusable)."""
    b, s_q, h, hd = q.shape
    rep = cfg.num_heads // cfg.num_kv_heads
    quant = isinstance(ck, dict)
    k_raw, v_raw = (ck["q"], cv["q"]) if quant else (ck, cv)
    key_idx = jnp.arange(k_raw.shape[1])                 # [max_len]
    if rolling is not None:
        g = query_positions[:, :, None]
        age = jnp.mod(g - key_idx[None, None, :], rolling)   # [b, s_q, W]
        key_global = g - age
        causal = age < cfg.sliding_window  # true at W == window; kept for W > w
        valid = key_global >= pad_lens[:, None, None]  # also kills unwritten
    else:
        causal = key_idx[None, None, :] <= query_positions[:, :, None]  # [b, s_q, max_len]
        band = (window_bound if window_bound is not None
                else cfg.sliding_window)  # traced per-layer bound (mixed) or static
        if band is not None:
            # Sliding window (mistral): cache indices and query positions
            # share one global index space — a second diagonal band.
            causal = causal & (query_positions[:, :, None] - key_idx[None, None, :]
                               < band)
        valid = key_idx[None, None, :] >= pad_lens[:, None, None]
    if rep > 1:
        # GQA: contract each kv head against its whole query group through
        # a group axis on q — the cache (the decode-bandwidth hot operand)
        # is never repeated/materialized at h heads.
        nkv = cfg.num_kv_heads
        qg = q.reshape(b, s_q, nkv, rep, hd)
        logits = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k_raw.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        if quant:
            logits = logits * ck["s"].transpose(0, 2, 1)[:, :, None, None, :]
        logits = logits / (hd ** 0.5)
        if cfg.attn_softcap is not None:
            logits = cfg.attn_softcap * jnp.tanh(logits / cfg.attn_softcap)
        mask = (causal & valid)[:, None, None]           # [b, 1, 1, s_q, max_len]
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(logits, axis=-1)
        if quant:
            w = w * cv["s"].transpose(0, 2, 1)[:, :, None, None, :]
        w = w.astype(q.dtype)
        return jnp.einsum("bhrqk,bkhd->bqhrd", w, v_raw.astype(q.dtype)).reshape(
            b, s_q, h * hd)
    k, v = k_raw, v_raw
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    if quant:
        logits = logits * ck["s"].transpose(0, 2, 1)[:, :, None, :]
    logits = logits / (hd ** 0.5)
    if cfg.attn_softcap is not None:
        logits = cfg.attn_softcap * jnp.tanh(logits / cfg.attn_softcap)
    mask = (causal & valid)[:, None]                     # [b, 1, s_q, max_len]
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits, axis=-1)
    if quant:
        w = w * cv["s"].transpose(0, 2, 1)[:, :, None, :]
    w = w.astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(q.dtype)).reshape(
        b, s_q, h * hd)


def _quantize_kv(t):
    """[b, s, nkv, hd] -> (int8 codes, f32 per-(token, head) scales).
    Shares the ops-level helper so the contiguous and paged int8 caches can
    never diverge numerically."""
    from ssp_x_vit_tpu.ops.pallas.paged_attention import _quantize_token_kv

    return _quantize_token_kv(t)


def _write_cache(ck_l, cv_l, k, v, write_pos, layer_idx=None):
    """``layer_idx`` (traced) writes into row layer_idx of FULL 5D caches
    [A, b, max_len, nkv, hd] — an in-place dynamic_update_slice on the scan
    CARRY (cf. _run_layers: stacked xs/ys re-materialize every layer's
    cache slice per decode step). None keeps the per-layer 4D contract."""
    if layer_idx is None:
        if isinstance(ck_l, dict):
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            ck_l = {"q": jax.lax.dynamic_update_slice(ck_l["q"], kq, (0, write_pos, 0, 0)),
                    "s": jax.lax.dynamic_update_slice(ck_l["s"], ks, (0, write_pos, 0))}
            cv_l = {"q": jax.lax.dynamic_update_slice(cv_l["q"], vq, (0, write_pos, 0, 0)),
                    "s": jax.lax.dynamic_update_slice(cv_l["s"], vs, (0, write_pos, 0))}
            return ck_l, cv_l
        ck_l = jax.lax.dynamic_update_slice(ck_l, k.astype(ck_l.dtype),
                                            (0, write_pos, 0, 0))
        cv_l = jax.lax.dynamic_update_slice(cv_l, v.astype(cv_l.dtype),
                                            (0, write_pos, 0, 0))
        return ck_l, cv_l
    li = layer_idx
    z = jnp.zeros((), jnp.int32)
    if isinstance(ck_l, dict):
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        ck_l = {"q": jax.lax.dynamic_update_slice(
                    ck_l["q"], kq[None].astype(ck_l["q"].dtype),
                    (li, z, write_pos, z, z)),
                "s": jax.lax.dynamic_update_slice(
                    ck_l["s"], ks[None].astype(ck_l["s"].dtype),
                    (li, z, write_pos, z))}
        cv_l = {"q": jax.lax.dynamic_update_slice(
                    cv_l["q"], vq[None].astype(cv_l["q"].dtype),
                    (li, z, write_pos, z, z)),
                "s": jax.lax.dynamic_update_slice(
                    cv_l["s"], vs[None].astype(cv_l["s"].dtype),
                    (li, z, write_pos, z))}
        return ck_l, cv_l
    ck_l = jax.lax.dynamic_update_slice(ck_l, k[None].astype(ck_l.dtype),
                                        (li, z, write_pos, z, z))
    cv_l = jax.lax.dynamic_update_slice(cv_l, v[None].astype(cv_l.dtype),
                                        (li, z, write_pos, z, z))
    return ck_l, cv_l


def _take_layer(cache, layer_idx):
    """Layer slice of a 5D cache (read side of the carry design; XLA fuses
    the dynamic slice into the attention einsum's operand read)."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0,
                                               keepdims=False), cache)


def _rolling_prefill_write(ck_l, cv_l, k, v, W: int):
    """Fill a W-slot rolling buffer from prefill k/v [b, p_pad, nkv, hd]:
    slot s receives the NEWEST prompt key with global index ≡ s (mod W) —
    j(s) = p_pad-1 - ((p_pad-1-s) mod W); slots with no such index (short
    prompts) get garbage that the attend mask kills (key_global < 0). The
    index map is STATIC (p_pad, W are trace constants): one gather, whole
    buffers replaced (donation-friendly)."""
    p_pad = k.shape[1]
    j = (p_pad - 1) - np.mod(p_pad - 1 - np.arange(W), W)      # [W] static
    jidx = jnp.asarray(np.maximum(j, 0), jnp.int32)
    kj, vj = k[:, jidx], v[:, jidx]                            # [b, W, nkv, hd]
    if isinstance(ck_l, dict):
        kq, ks = _quantize_kv(kj)
        vq, vs = _quantize_kv(vj)
        return ({"q": kq, "s": ks}, {"q": vq, "s": vs})
    return kj.astype(ck_l.dtype), vj.astype(cv_l.dtype)


def _attend_direct(q, k, v, positions, pad_lens, cfg: LlamaConfig):
    """Full-sequence attention on in-layer k/v (rolling-cache prefill: the
    rolling buffer only retains the last W keys, but early prompt queries
    need earlier ones). Causal + sliding-window band + left-pad mask;
    q [b, s, h, hd], k/v [b, s, nkv, hd] -> [b, s, h*hd]."""
    b, s, h, hd = q.shape
    rep = cfg.num_heads // cfg.num_kv_heads
    kf = jnp.repeat(k, rep, axis=2) if rep > 1 else k
    vf = jnp.repeat(v, rep, axis=2) if rep > 1 else v
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, kf,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    if cfg.attn_softcap is not None:
        logits = cfg.attn_softcap * jnp.tanh(logits / cfg.attn_softcap)
    g = positions[:, :, None]                                  # [b, s, 1]
    j = positions[:, None, :]                                  # [b, 1, s]
    mask = (j <= g) & (j >= pad_lens[:, None, None])
    if cfg.sliding_window is not None:
        mask = mask & (g - j < cfg.sliding_window)
    logits = jnp.where(mask[:, None], logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vf).reshape(b, s, h * hd)


def _attn_branch(h, bp, ck_l, cv_l, cfg: LlamaConfig, *, global_positions,
                 rope_positions, pad_lens, write_pos, compute_dtype, rolling,
                 lora_ids=None, window_bound=None, layer_idx=None):
    """qkv + cache write + cached attention, shared by the three block
    layouts. Rolling-cache PREFILL (s > 1) attends directly on the in-layer
    k/v — the W-slot buffer cannot hold the early prompt keys that early
    queries need — and then fills the buffer with the newest W keys.
    ``window_bound``: traced per-layer band bound (mixed-window configs).
    ``layer_idx``: ck_l/cv_l are FULL 5D caches carried through the layer
    scan; the write is an in-place row update and the attend reads a layer
    slice (_attend_cached keeps its 4D contract for the A/B benches)."""
    q, k, v = _block_qkv(h, bp, cfg, rope_positions, compute_dtype, lora_ids)
    if rolling is not None and q.shape[1] > 1:
        attn = _attend_direct(q, k, v, global_positions, pad_lens, cfg)
        if layer_idx is None:
            ck_l, cv_l = _rolling_prefill_write(ck_l, cv_l, k, v, rolling)
        else:
            nk, nv = _rolling_prefill_write(_take_layer(ck_l, layer_idx),
                                            _take_layer(cv_l, layer_idx),
                                            k, v, rolling)
            z = jnp.zeros((), jnp.int32)
            upd = lambda full, one: jax.lax.dynamic_update_slice(
                full, one[None].astype(full.dtype),
                (layer_idx,) + (z,) * (full.ndim - 1))
            ck_l = jax.tree.map(upd, ck_l, nk)
            cv_l = jax.tree.map(upd, cv_l, nv)
        return attn, ck_l, cv_l
    ck_l, cv_l = _write_cache(ck_l, cv_l, k, v, write_pos, layer_idx)
    k4 = _take_layer(ck_l, layer_idx) if layer_idx is not None else ck_l
    v4 = _take_layer(cv_l, layer_idx) if layer_idx is not None else cv_l
    attn = _attend_cached(q, k4, v4, global_positions, pad_lens, cfg,
                          rolling, window_bound)
    return attn, ck_l, cv_l


def _layer_step(x, bp, ck_l, cv_l, cfg: LlamaConfig, *, global_positions,
                rope_positions, pad_lens, write_pos, compute_dtype,
                has_attn=True, rolling: Optional[int] = None, lora_ids=None,
                window_bound=None, layer_idx=None):
    """One transformer layer over cached attention.

    global_positions [b, s]: indices into the cache for the mask;
    rope_positions [b, s]: pad-corrected rotary positions;
    write_pos: scalar cache write offset (shared — prompts are left-padded;
    rolling callers pass pos mod W);
    rolling: W slot count of a rolling cache (None = contiguous);
    layer_idx: ck_l/cv_l are FULL 5D caches, this layer's row addressed in
    place (see _attn_branch).
    """
    attn_kw = dict(global_positions=global_positions,
                   rope_positions=rope_positions, pad_lens=pad_lens,
                   write_pos=write_pos, compute_dtype=compute_dtype,
                   rolling=rolling, lora_ids=lora_ids,
                   window_bound=window_bound, layer_idx=layer_idx)
    if cfg.is_opt:
        # OPT sequential pre-LN block: LN1 -> attn -> residual, LN2 -> ReLU
        # fc MLP -> residual; no rope (learned absolute positions at the
        # embedding). Reference adapters/opt_adapter.py:18-113.
        if has_attn:
            h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
            attn, ck_l, cv_l = _attn_branch(h, bp, ck_l, cv_l, cfg, **attn_kw)
            x = x + _proj_o(attn, bp, compute_dtype, lora_ids) + \
                bp["o_bias"].astype(compute_dtype)
        h2 = _layer_norm(x, bp["ln2"], bp["ln2_bias"], cfg.layer_norm_eps)
        hm = _mm(h2, bp, "fc1_kernel", compute_dtype) + \
            bp["fc1_bias"].astype(compute_dtype)
        mlp = _mm(jax.nn.relu(hm), bp, "fc2_kernel", compute_dtype) + \
            bp["fc2_bias"].astype(compute_dtype)
        return x + mlp, ck_l, cv_l

    if cfg.is_phi:
        h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
        delta = jnp.zeros_like(x)
        if has_attn:
            attn, ck_l, cv_l = _attn_branch(h, bp, ck_l, cv_l, cfg, **attn_kw)
            delta = _proj_o(attn, bp, compute_dtype, lora_ids) + \
                bp["o_bias"].astype(compute_dtype)
        from ssp_x_vit_tpu.ops.common import gelu

        hm = _mm(h, bp, "fc1_kernel", compute_dtype) + bp["fc1_bias"].astype(compute_dtype)
        mlp = _mm(gelu(hm), bp, "fc2_kernel", compute_dtype) + \
            bp["fc2_bias"].astype(compute_dtype)
        return x + delta + mlp, ck_l, cv_l

    if has_attn:
        h = rms_norm(x, bp["ln1"], cfg.rms_eps)
        attn, ck_l, cv_l = _attn_branch(h, bp, ck_l, cv_l, cfg, **attn_kw)
        attn = _proj_o(attn, bp, compute_dtype, lora_ids)
        if "o_bias" in bp:
            attn = attn + bp["o_bias"].astype(compute_dtype)
        if cfg.is_gemma2:  # post-norm on the residual delta
            attn = rms_norm(attn, bp["ln1_post"], cfg.rms_eps)
        x = x + attn
    h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
    if cfg.num_experts:
        # switch-MoE block MLP (bf16 OR int8-quantized expert weights —
        # _moe_mlp dispatches on the _q keys; the router/expert kernels
        # ride the same scanned pytree slices as dense kernels)
        from ssp_x_vit_tpu.llm.model import _moe_mlp

        mlp, _ = _moe_mlp(h2, bp, cfg, compute_dtype)
        return x + mlp, ck_l, cv_l
    if any(k.startswith("gateup_kernel") for k in bp):
        gu = _mm(h2, bp, "gateup_kernel", compute_dtype)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = _mm(h2, bp, "gate_kernel", compute_dtype)
        u = _mm(h2, bp, "up_kernel", compute_dtype)
    mlp = _mm(_glu_act(cfg)(g) * u, bp, "down_kernel", compute_dtype)
    if cfg.is_gemma2:
        mlp = rms_norm(mlp, bp["ln2_post"], cfg.rms_eps)
    return x + mlp, ck_l, cv_l


_LLAMA_ATTN_KEYS = ("ln1", "ln1_bias", "q_kernel", "k_kernel", "v_kernel",
                    "o_kernel", "qkv_kernel", "q_bias", "k_bias", "v_bias",
                    "o_bias", "ln1_post", "q_norm", "k_norm")


def pack_llm_params_for_serving(params: Params, cfg: LlamaConfig) -> Params:
    """Fuse per-layer q/k/v -> qkv_kernel [.., d, hq+2hkv] and gate/up ->
    gateup_kernel [.., d, 2f] so each decode step runs one matmul where it
    ran three/two (fewer dispatches, better weight streaming at b=1).
    Mathematically identical (column-wise concatenation commutes with the
    contraction). Works on bf16 AND int8-quantized pytrees (codes and
    per-out-channel scales concatenate the same way); int4 packed layouts
    are left unfused; biases stay separate (O(d) adds)."""
    blocks = dict(params["blocks"])

    def cat(names, suffix, axis):
        arrs = [blocks.pop(n + suffix) for n in names]
        return jnp.concatenate(arrs, axis=axis)

    if "q_kernel" in blocks:
        blocks["qkv_kernel"] = cat(("q_kernel", "k_kernel", "v_kernel"), "", -1)
    elif "q_kernel_q" in blocks:
        blocks["qkv_kernel_q"] = cat(("q_kernel", "k_kernel", "v_kernel"), "_q", -1)
        blocks["qkv_kernel_scale"] = cat(
            ("q_kernel", "k_kernel", "v_kernel"), "_scale", -1)
    # biases (qwen2/phi) stay separate — they are O(d) adds, not matmuls
    if "gate_kernel" in blocks and blocks["gate_kernel"].ndim == 3:
        # dense MLP only: MoE expert kernels [L, E, d, f] stay unfused
        # (moe_ffn contracts gate/up separately per expert)
        blocks["gateup_kernel"] = cat(("gate_kernel", "up_kernel"), "", -1)
    elif "gate_kernel_q" in blocks and blocks["gate_kernel_q"].ndim == 3:
        # dense-quantized only: 4-D MoE expert codes stay unfused too
        blocks["gateup_kernel_q"] = cat(("gate_kernel", "up_kernel"), "_q", -1)
        blocks["gateup_kernel_scale"] = cat(
            ("gate_kernel", "up_kernel"), "_scale", -1)
    out = {k: v for k, v in params.items() if k != "blocks"}
    out["blocks"] = blocks
    return out


def _base_key(k: str) -> str:
    """Strip the quantization suffixes so quantized pytrees route through
    the same attention/MLP key split (``q_kernel_q`` -> ``q_kernel``)."""
    for suf in ("_lora_a", "_lora_b", "_q4", "_q", "_scale"):
        if k.endswith(suf):
            return k[: -len(suf)]
    return k


def _run_layers(params, x, cache_k, cache_v, cfg: LlamaConfig, *,
                global_positions, rope_positions, pad_lens, write_pos,
                compute_dtype, rolling: Optional[int] = None, lora_ids=None):
    """All transformer layers. Dense models scan over the stacked pytree;
    depth-materialized models (attention arrays shorter than MLP arrays)
    unroll with attn_store_index (cf. llama_forward_materialized)."""
    blocks = params["blocks"]
    kw = dict(global_positions=global_positions, rope_positions=rope_positions,
              pad_lens=pad_lens, write_pos=write_pos, compute_dtype=compute_dtype,
              rolling=rolling, lora_ids=lora_ids)

    # mixed per-layer windows ride the scan as traced bounds; uniform
    # configs pass None (static flash-capable masks)
    wbounds = jnp.asarray(cfg.layer_window_bounds, jnp.int32)

    if not cfg.pruned_attention_blocks:
        # caches ride the scan as CARRY with in-place row writes, NOT as
        # stacked xs/ys (which re-materialize every layer's cache slice per
        # step — the paged path measured 12 ms/step of pure pool shuffling
        # from exactly this pattern, scripts/bench_paged_gap.py)
        def body(carry, scanned):
            x, ck, cv = carry
            bp, wb, li = scanned
            x, ck, cv = _layer_step(
                x, bp, ck, cv, cfg,
                window_bound=None if cfg.uniform_window else wb,
                layer_idx=li, **kw)
            return (x, ck, cv), None

        A = jax.tree.leaves(cache_k)[0].shape[0]
        (x, cache_k, cache_v), _ = jax.lax.scan(
            body, (x, cache_k, cache_v),
            (blocks, wbounds, jnp.arange(A, dtype=jnp.int32)))
        return x, cache_k, cache_v

    store = cfg.attn_store_index
    # phi's ln1 feeds BOTH branches, so it stays full-layer-indexed there;
    # OPT's ln1/ln1_bias belong to the attention branch (removed with it).
    attn_keys = set(_LLAMA_ATTN_KEYS)
    if cfg.is_phi:
        attn_keys -= {"ln1", "ln1_bias"}
    for i in range(cfg.num_layers):
        j = store[i]
        bp = {}
        for k, v in blocks.items():
            if _base_key(k) in attn_keys:
                if j is None:
                    continue
                bp[k] = v[j]
            else:
                bp[k] = v[i]
        wb = None if cfg.uniform_window else wbounds[i]
        if j is None:
            x, _, _ = _layer_step(x, bp, None, None, cfg, has_attn=False,
                                  window_bound=wb, **kw)
        else:
            x, cache_k, cache_v = _layer_step(
                x, bp, cache_k, cache_v, cfg, window_bound=wb,
                layer_idx=jnp.asarray(j, jnp.int32), **kw)
    return x, cache_k, cache_v


def _final_logits(params, x, cfg: LlamaConfig, compute_dtype):
    if cfg.is_phi or cfg.is_opt:
        x = _layer_norm(x, params["ln_final"], params["ln_final_bias"],
                        cfg.layer_norm_eps)
    else:
        x = rms_norm(x, params["ln_final"], cfg.rms_eps)
    if "lm_head_q" in params:
        logits = (x @ params["lm_head_q"].astype(compute_dtype)).astype(
            jnp.float32) * params["lm_head_scale"]
        if "lm_head_bias" in params:
            logits = logits + params["lm_head_bias"].astype(jnp.float32)
        if cfg.final_softcap is not None:
            logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
        return logits
    head = params.get("lm_head", None)
    if head is None:
        head = params["embed"].T
    logits = (x @ head.astype(compute_dtype)).astype(jnp.float32)
    if "lm_head_bias" in params:
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


@functools.partial(jax.jit, static_argnames=("cfg", "rolling"),
                   donate_argnums=(2, 3))
def prefill(params: Params, tokens: jax.Array, cache_k, cache_v, cfg: LlamaConfig,
            pad_lens: jax.Array, rolling: Optional[int] = None,
            lora_ids: Optional[jax.Array] = None):
    """Run LEFT-padded prompts ([b, p_pad]) through the model, filling the
    cache; ``pad_lens [b]`` = p_pad - prompt_len per sequence. ``rolling`` =
    W slot count of a rolling cache (init_rolling_cache). Returns
    (logits at the last position [b, V], cache_k, cache_v)."""
    compute_dtype = cache_compute_dtype(cache_k)
    b, p_pad = tokens.shape
    x = _embed_tokens(params, tokens, cfg, compute_dtype)
    idx = jnp.arange(p_pad)
    global_positions = jnp.broadcast_to(idx[None], (b, p_pad))
    rope_positions = jnp.maximum(0, idx[None] - pad_lens[:, None])
    if cfg.is_opt:
        # learned absolute positions at pad-corrected indices, HF offset of 2
        # (OPTLearnedPositionalEmbedding; pad slots are masked out of attention
        # so their arbitrary index-2 embedding never reaches a real token).
        x = x + params["pos_embed"].astype(compute_dtype)[2 + rope_positions]
    x, cache_k, cache_v = _run_layers(
        params, x, cache_k, cache_v, cfg,
        global_positions=global_positions, rope_positions=rope_positions,
        pad_lens=pad_lens, write_pos=0, compute_dtype=compute_dtype,
        rolling=rolling, lora_ids=lora_ids)
    return _final_logits(params, x[:, -1:], cfg, compute_dtype)[:, 0], cache_k, cache_v


def _decode_body(params: Params, token: jax.Array, cache_k, cache_v,
                 cfg: LlamaConfig, pos: jax.Array, pad_lens: jax.Array,
                 rolling: Optional[int] = None, lora_ids=None):
    compute_dtype = cache_compute_dtype(cache_k)
    b = token.shape[0]
    x = _embed_tokens(params, token, cfg, compute_dtype)[:, None, :]  # [b, 1, d]
    global_positions = jnp.broadcast_to(pos[None, None], (b, 1))
    rope_positions = pos[None, None] - pad_lens[:, None]
    if cfg.is_opt:
        x = x + params["pos_embed"].astype(compute_dtype)[2 + rope_positions]
    write_pos = pos if rolling is None else jnp.mod(pos, rolling)
    x, cache_k, cache_v = _run_layers(
        params, x, cache_k, cache_v, cfg,
        global_positions=global_positions, rope_positions=rope_positions,
        pad_lens=pad_lens, write_pos=write_pos, compute_dtype=compute_dtype,
        rolling=rolling, lora_ids=lora_ids)
    return _final_logits(params, x, cfg, compute_dtype)[:, 0], cache_k, cache_v


@functools.partial(jax.jit, static_argnames=("cfg", "rolling"),
                   donate_argnums=(2, 3))
def decode_step(params: Params, token: jax.Array, cache_k, cache_v,
                cfg: LlamaConfig, pos: jax.Array, pad_lens: jax.Array,
                rolling: Optional[int] = None,
                lora_ids: Optional[jax.Array] = None):
    """One token ([b] int32) at shared global position ``pos``;
    returns (logits [b, V], caches)."""
    return _decode_body(params, token, cache_k, cache_v, cfg, pos, pad_lens,
                        rolling, lora_ids)


def _sample_token(logits, rng, temperature: float, top_k: Optional[int],
                  top_p: Optional[float] = None):
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / temperature
    if top_k is not None:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
    if top_p is not None and top_p < 1.0:
        if top_p <= 0.0:
            # all-(-inf) logits would make categorical() silently emit
            # token 0 forever instead of "keep only the top token"
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        # nucleus: keep the smallest prefix of the sorted distribution whose
        # mass reaches top_p, INCLUDING the crossing token (HF convention) —
        # token kept iff the cumulative mass BEFORE it is < top_p, so the
        # top-1 token always survives.
        srt = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        before = jnp.cumsum(probs, axis=-1) - probs
        kept = jnp.where(before < top_p, srt, jnp.inf)
        thresh = jnp.min(kept, axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= thresh, scaled, -jnp.inf)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "temperature", "top_k", "top_p",
                     "rolling", "sampling"),
    donate_argnums=(2, 3),
)
def decode_scan(params: Params, first_token: jax.Array, cache_k, cache_v,
                cfg: LlamaConfig, start_pos: jax.Array, pad_lens: jax.Array,
                num_steps: int, rng: Optional[jax.Array] = None,
                temperature: float = 0.0, top_k: Optional[int] = None,
                rolling: Optional[int] = None, top_p: Optional[float] = None,
                lora_ids: Optional[jax.Array] = None,
                sampling=None, penalty_state=None):
    """Run ``num_steps`` decode steps ENTIRELY on device (lax.scan with token
    feedback) — one dispatch for the whole generation, which matters on
    dispatch-latency-bound links (docs/tpu_notes.md). Greedy when
    temperature == 0, else temperature/top-k/top-p/min-p sampling. Returns
    the generated tokens [num_steps, b] and the final caches.

    ``sampling`` (llm/sampling.SamplingParams, static) supersedes the loose
    temperature/top_k/top_p kwargs and adds min_p + repetition/presence/
    frequency penalties; when penalties are active, ``penalty_state`` =
    (prompt presence mask [b, V], generated counts [b, V] INCLUDING
    first_token) rides the scan carry and a scatter-add per step keeps the
    counts current."""
    from ssp_x_vit_tpu.llm import sampling as sampling_mod

    sp = sampling if sampling is not None else sampling_mod.SamplingParams(
        temperature=temperature, top_k=top_k, top_p=top_p)
    if sp.needs_counts and penalty_state is None:
        raise ValueError("penalty sampling needs penalty_state (use "
                         "generate_kv_scan, which initializes it)")
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, _):
        token, ck, cv, pos, key, pstate = carry
        logits, ck, cv = _decode_body(params, token, ck, cv, cfg, pos, pad_lens,
                                      rolling, lora_ids)
        if sp.needs_counts:
            pmask, counts = pstate
            logits = sampling_mod.apply_penalties(logits, pmask, counts, sp)
        key, sub = jax.random.split(key)
        nxt = sampling_mod.sample(logits, sub, sp)
        if sp.needs_counts:
            pstate = (pmask, sampling_mod.update_counts(counts, nxt))
        return (nxt, ck, cv, pos + 1, key, pstate), nxt

    (_, cache_k, cache_v, _, _, _), tokens = jax.lax.scan(
        step, (first_token, cache_k, cache_v, start_pos, rng, penalty_state),
        None, length=num_steps)
    return tokens, cache_k, cache_v


# Backwards-compatible alias (greedy-only entry used by benchmarks).
def greedy_decode_scan(params, first_token, cache_k, cache_v, cfg, start_pos,
                       pad_lens, num_steps: int):
    return decode_scan(params, first_token, cache_k, cache_v, cfg, start_pos,
                       pad_lens, num_steps)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "eos_token_id", "rolling",
                     "sampling"),
    donate_argnums=(2, 3),
)
def decode_while(params: Params, first_token: jax.Array, cache_k, cache_v,
                 cfg: LlamaConfig, start_pos: jax.Array, pad_lens: jax.Array,
                 num_steps: int, eos_token_id: int,
                 rng: Optional[jax.Array] = None,
                 rolling: Optional[int] = None,
                 lora_ids: Optional[jax.Array] = None,
                 sampling=None, penalty_state=None):
    """decode_scan with IN-GRAPH eos early exit: a ``lax.while_loop`` stops
    the moment every row has emitted ``eos_token_id``, still one dispatch.

    Rows that finish keep feeding eos (their outputs past the first eos are
    trimmed by the caller, exactly like the scan path trims); per-row
    outputs up to and including the first eos are IDENTICAL to decode_scan.
    The win is latency: a b=1 chat-style answer of 30 tokens under a
    max_length budget of 512 runs 30 steps, not 511."""
    from ssp_x_vit_tpu.llm import sampling as sampling_mod

    sp = sampling if sampling is not None else sampling_mod.SamplingParams()
    if sp.needs_counts and penalty_state is None:
        raise ValueError("penalty sampling needs penalty_state (use "
                         "generate_kv_scan, which initializes it)")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b = first_token.shape[0]
    out0 = jnp.full((num_steps, b), eos_token_id, jnp.int32)
    done0 = first_token == eos_token_id

    def cond(carry):
        step, _token, _ck, _cv, _pos, _key, _pstate, _out, done = carry
        return jnp.logical_and(step < num_steps, ~jnp.all(done))

    def body(carry):
        step, token, ck, cv, pos, key, pstate, out, done = carry
        logits, ck, cv = _decode_body(params, token, ck, cv, cfg, pos,
                                      pad_lens, rolling, lora_ids)
        if sp.needs_counts:
            pmask, counts = pstate
            logits = sampling_mod.apply_penalties(logits, pmask, counts, sp)
        key, sub = jax.random.split(key)
        nxt = sampling_mod.sample(logits, sub, sp)
        nxt = jnp.where(done, eos_token_id, nxt)
        if sp.needs_counts:
            pstate = (pmask, sampling_mod.update_counts(counts, nxt))
        out = jax.lax.dynamic_update_slice_in_dim(out, nxt[None], step,
                                                  axis=0)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return (step + 1, nxt, ck, cv, pos + 1, key, pstate, out, done)

    carry = (jnp.zeros((), jnp.int32), first_token, cache_k, cache_v,
             start_pos, rng, penalty_state, out0, done0)
    (_, _, cache_k, cache_v, _, _, _, out, _) = jax.lax.while_loop(
        cond, body, carry)
    return out, cache_k, cache_v


def _prepare_prompts(input_ids, max_length: int):
    """list/array of prompts -> (tokens [b, p_pad] left-padded, pad_lens [b],
    prompt_lens [b], p_pad)."""
    if isinstance(input_ids, np.ndarray) and input_ids.ndim == 1:
        prompts = [input_ids.tolist()]
    elif isinstance(input_ids, np.ndarray):
        prompts = [row.tolist() for row in input_ids]
    elif input_ids and isinstance(input_ids[0], (int, np.integer)):
        prompts = [list(input_ids)]
    else:
        prompts = [list(p) for p in input_ids]
    lens = np.asarray([len(p) for p in prompts], np.int32)
    if lens.max() >= max_length:
        raise ValueError(f"prompt length {lens.max()} >= max_length {max_length}")
    p_pad = min(bucket_prompt_pad(int(lens.max())), max_length)
    p_pad = max(p_pad, int(lens.max()))
    tokens = np.zeros((len(prompts), p_pad), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, p_pad - len(p):] = p
    return tokens, (p_pad - lens).astype(np.int32), lens, p_pad


def _trim_outputs(prompts_lens, pad_lens, p_pad, prompt_tokens, gen, max_length,
                  eos_token_id):
    """Assemble per-sequence outputs: prompt + generated, cut at eos/cap."""
    outs = []
    b = len(prompts_lens)
    for i in range(b):
        prompt = prompt_tokens[i, pad_lens[i]:].tolist()
        budget = max_length - prompts_lens[i]
        seq = gen[: max(0, budget), i].tolist()
        if eos_token_id is not None and eos_token_id in seq:
            seq = seq[: seq.index(eos_token_id) + 1]
        outs.append(np.asarray(prompt + seq, np.int32))
    return outs


def generate_kv_scan(
    params: Params,
    cfg: LlamaConfig,
    input_ids,
    *,
    max_length: int = 64,
    eos_token_id: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    rng: Optional[jax.Array] = None,
    cache_factory=None,
    rolling: bool = False,
    lora_ids=None,
    sampling=None,
    early_stop: bool = True,
):
    """Whole-generation-on-device decoding: prefill + ONE scan dispatch (no
    per-token host round trips). Batched: ``input_ids`` may be one prompt or a
    list of prompts of different lengths (left-padded to a shared bucket).
    Returns a list of per-sequence token arrays (prompt + generation, trimmed
    at eos); a single 1-D prompt returns a single array.

    ``cache_factory`` (same signature as init_cache) lets callers place the
    cache — e.g. tensor-parallel head sharding over a mesh
    (parallel.llm_sharding.tp_cache_factory); computation follows the
    params/cache shardings through the jitted prefill/decode.

    ``rolling=True`` (sliding-window models) bounds the cache to
    ``cfg.sliding_window`` slots regardless of generation length — exact,
    because the window already hides everything older."""
    single = (isinstance(input_ids, np.ndarray) and input_ids.ndim == 1) or (
        not isinstance(input_ids, np.ndarray) and input_ids
        and isinstance(input_ids[0], (int, np.integer)))
    tokens, pad_lens, lens, p_pad = _prepare_prompts(input_ids, max_length)
    b = tokens.shape[0]
    num_steps = max_length - int(lens.min()) - 1
    W = None
    if rolling:
        if cfg.sliding_window is None or not cfg.uniform_window:
            raise ValueError("rolling=True requires a uniform cfg.sliding_window")
        W = cfg.sliding_window
    factory = cache_factory if cache_factory is not None else init_cache
    cache_len = W if W is not None else p_pad + max(num_steps, 0) + 1
    cache_k, cache_v = factory(cfg, b, cache_len, cache_dtype)
    if lora_ids is not None:
        lora_ids = jnp.asarray(lora_ids, jnp.int32)
    logits, cache_k, cache_v = prefill(
        params, jnp.asarray(tokens), cache_k, cache_v, cfg,
        jnp.asarray(pad_lens), rolling=W, lora_ids=lora_ids)
    from ssp_x_vit_tpu.llm import sampling as sampling_mod

    sp = sampling if sampling is not None else sampling_mod.SamplingParams(
        temperature=temperature, top_k=top_k, top_p=top_p)
    pstate = None
    if sp.needs_counts:
        valid = (jnp.arange(p_pad)[None, :]
                 >= jnp.asarray(pad_lens)[:, None])
        pmask, counts = sampling_mod.init_penalty_state(
            jnp.asarray(tokens), valid, cfg.vocab_size)
        logits = sampling_mod.apply_penalties(logits, pmask, counts, sp)
    if sp.greedy:
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, sub = jax.random.split(rng)
        first = sampling_mod.sample(logits, sub, sp)
    if sp.needs_counts:
        pstate = (pmask, sampling_mod.update_counts(counts, first))
    if num_steps <= 0:
        gen = np.asarray(first)[None]
    elif eos_token_id is not None and early_stop:
        # in-graph early exit: stop the while_loop when every row has hit
        # eos (identical trimmed outputs; saves the unused step budget)
        toks, _, _ = decode_while(
            params, first, cache_k, cache_v, cfg,
            jnp.asarray(p_pad, jnp.int32), jnp.asarray(pad_lens), num_steps,
            int(eos_token_id), rng=rng, sampling=sp, penalty_state=pstate,
            rolling=W, lora_ids=lora_ids)
        gen = np.concatenate([np.asarray(first)[None], np.asarray(toks)], axis=0)
    else:
        toks, _, _ = decode_scan(
            params, first, cache_k, cache_v, cfg,
            jnp.asarray(p_pad, jnp.int32), jnp.asarray(pad_lens), num_steps,
            rng=rng, sampling=sp, penalty_state=pstate,
            rolling=W, lora_ids=lora_ids)
        gen = np.concatenate([np.asarray(first)[None], np.asarray(toks)], axis=0)
    outs = _trim_outputs(lens, pad_lens, p_pad, tokens, gen, max_length,
                         eos_token_id)
    return outs[0] if single else outs


def greedy_generate_kv_scan(params, cfg, input_ids, *, max_length: int = 64,
                            cache_dtype=jnp.bfloat16):
    """Greedy whole-generation-on-device decoding (see generate_kv_scan)."""
    return generate_kv_scan(params, cfg, input_ids, max_length=max_length,
                            cache_dtype=cache_dtype)


def greedy_generate_kv(
    params: Params,
    cfg: LlamaConfig,
    input_ids,
    *,
    max_length: int = 64,
    eos_token_id: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
    rolling: bool = False,
    lora_ids=None,
):
    """KV-cached greedy decoding with per-token host feedback (early eos stop).
    Functionally equals generate.greedy_generate without n-gram banning.
    One prefill compile per prompt bucket + one decode-step compile. Batched:
    sequences that hit eos keep decoding but their outputs are trimmed.
    ``rolling=True``: window-bounded cache (see generate_kv_scan)."""
    single = (isinstance(input_ids, np.ndarray) and input_ids.ndim == 1) or (
        not isinstance(input_ids, np.ndarray) and input_ids
        and isinstance(input_ids[0], (int, np.integer)))
    tokens, pad_lens, lens, p_pad = _prepare_prompts(input_ids, max_length)
    b = tokens.shape[0]
    max_steps = max_length - int(lens.min())
    W = None
    if rolling:
        if cfg.sliding_window is None or not cfg.uniform_window:
            raise ValueError("rolling=True requires a uniform cfg.sliding_window")
        W = cfg.sliding_window
        cache_k, cache_v = init_rolling_cache(cfg, b, cache_dtype)
    else:
        cache_k, cache_v = init_cache(cfg, b, p_pad + max_steps, cache_dtype)
    if lora_ids is not None:
        lora_ids = jnp.asarray(lora_ids, jnp.int32)
    logits, cache_k, cache_v = prefill(
        params, jnp.asarray(tokens), cache_k, cache_v, cfg,
        jnp.asarray(pad_lens), rolling=W, lora_ids=lora_ids)

    generated = [[] for _ in range(b)]
    done = np.zeros(b, bool)
    pos = p_pad
    while True:
        nxt = np.argmax(np.asarray(logits), axis=-1).astype(np.int32)
        for i in range(b):
            if not done[i] and len(generated[i]) < max_length - lens[i]:
                generated[i].append(int(nxt[i]))
                if eos_token_id is not None and nxt[i] == eos_token_id:
                    done[i] = True
                if len(generated[i]) >= max_length - lens[i]:
                    done[i] = True
        if done.all():
            break
        logits, cache_k, cache_v = decode_step(
            params, jnp.asarray(nxt), cache_k, cache_v, cfg,
            jnp.asarray(pos, jnp.int32), jnp.asarray(pad_lens), rolling=W,
            lora_ids=lora_ids)
        pos += 1

    outs = [np.asarray(tokens[i, pad_lens[i]:].tolist() + generated[i], np.int32)
            for i in range(b)]
    return outs[0] if single else outs
