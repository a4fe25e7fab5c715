"""Fused ViT attention-block kernel: LN1 + QKV + attention + out-proj +
gated residual add in ONE pallas_call.

Motivation (VERDICT r1 #4 / COVERAGE "Known gaps"): at ViT dims (b=256,
s=197, h=768, 12 heads) the standalone attention is transcendental/HBM-bound
and XLA's fusion beats every per-op pallas variant tried (3.79 ms vs 4.96 ms
best, docs/tpu_notes.md). The remaining idea is fusing the WHOLE residual
branch so the LN output, q/k/v, and the pre-proj attention output never
round-trip to HBM.

Mosaic constraint that shapes the design: VMEM loads/stores must have
lane-dimension offsets that are multiples of 128, so a [s, 3d] fused-qkv
buffer cannot be sliced per head (head_dim 64). Instead the q/k/v/proj
weights arrive PRE-SPLIT per head ([heads, d, hd] / [heads, hd, d], reshaped
outside the kernel) and the kernel runs per-head matmuls — first-axis
indexing only — accumulating each head's projection contribution into an f32
scratch. Head matmuls at N=64 (or K=64 for the projection) use half the MXU
tile width; that inefficiency is the price of fusion and is why this kernel
must be MEASURED against XLA's branch (scripts/bench_fused_attn_block.py)
rather than assumed faster.

The per-block skip gate rides in as an SMEM scalar — ``out = x + gate *
branch(x)`` — so the zero-retrace search phases (mask-parameterized
candidates, models/vit.py) can use the same compiled kernel.

Replaces the reference's separate LayerNorm -> ViTSelfAttention ->
ViTSelfOutput module stack (HF modeling_vit; reference accesses it via
src/vit_pruning.py:28-75 anatomy helpers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)

# Images per program. 2 amortizes program/DMA overhead while keeping the
# scratch + per-head weights inside scoped VMEM at ViT-B dims.
GROUP_BATCH = 2


def _kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, bqkv_ref,
            wproj_ref, bproj_ref, gate_ref, o_ref, acc_scr, *,
            num_heads: int, seq_len: int, eps: float, group: int):
    g_, s_pad, d = x_ref.shape
    hd = d // num_heads
    x = x_ref[:]                                     # [G, S_pad, d]
    x2 = x.reshape(group * s_pad, d)

    # LayerNorm (f32 accumulation)
    x32 = x2.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    y = y.astype(x.dtype)

    scale = 1.0 / (hd ** 0.5)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    seq_mask = col < seq_len

    for h in range(num_heads):  # static unroll: first-axis weight indexing only
        q = jax.lax.dot_general(
            y, wq_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        k = jax.lax.dot_general(
            y, wk_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        v = jax.lax.dot_general(
            y, wv_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        q = (q + bqkv_ref[0, h].astype(jnp.float32)).astype(x.dtype)
        k = (k + bqkv_ref[1, h].astype(jnp.float32)).astype(x.dtype)
        v = (v + bqkv_ref[2, h].astype(jnp.float32)).astype(x.dtype)

        for g in range(group):  # static row slices (multiples of S_pad)
            qs = q[g * s_pad:(g + 1) * s_pad]        # [S_pad, hd]
            ks = k[g * s_pad:(g + 1) * s_pad]
            vs = v[g * s_pad:(g + 1) * s_pad]
            logits = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(seq_mask, logits, _NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(x.dtype)
            o_h = jax.lax.dot_general(
                p, vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
            # head contribution to the projection, accumulated in f32
            acc_scr[g * s_pad:(g + 1) * s_pad, :] += jax.lax.dot_general(
                o_h, wproj_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    gate = gate_ref[0, 0].astype(jnp.float32)
    out = acc_scr[:] + bproj_ref[:].astype(jnp.float32)
    x_full32 = x.reshape(group * s_pad, d).astype(jnp.float32)
    o_ref[:] = (x_full32 + gate * out).astype(o_ref.dtype).reshape(
        group, s_pad, d)


def _kernel_v2(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
               bproj_ref, gate_ref, o_ref, oall_scr, *,
               num_heads: int, seq_len: int, eps: float, group: int):
    """v2: FULL-WIDTH qkv matmul + masked head-pair attention core.

    The v1 kernel ran 3 x num_heads [*, d, 64] matmuls — N=64 uses half the
    MXU lane width, so the projections (6x the attention-core FLOPs at ViT-B
    dims) ran at ~50% utilization. Here:

      qkv   = LN(x) @ Wqkv           one [G*S, d] @ [d, 3d] matmul, full MXU
      per head PAIR p (lane offsets 128p — Mosaic-legal):
        per head in the pair: logits = (q_pair * lane_mask) @ k_pair^T
          (contraction over 128 lanes, the other head's lanes zeroed — exact,
           same MAC efficiency as K=64 but no 64-offset slicing)
        o_pair += softmax(logits) @ (v_pair * lane_mask)
          (masked v zeroes the other head's OUTPUT lanes, so the pair output
           assembles itself in one [S, 128] buffer)
      out   = o_all @ Wproj          one [G*S, d] @ [d, d] matmul, full MXU
    """
    g_, s_pad, d = x_ref.shape
    hd = d // num_heads
    x = x_ref[:]
    x2 = x.reshape(group * s_pad, d)

    x32 = x2.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * lns_ref[:].astype(jnp.float32)
         + lnb_ref[:].astype(jnp.float32)).astype(x.dtype)

    qkv = jax.lax.dot_general(
        y, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)

    scale = 1.0 / (hd ** 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    seq_mask = col < seq_len
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * hd), 1)

    n_pairs = num_heads // 2
    for p in range(n_pairs):  # static: all lane offsets are multiples of 128
        q_pair = qkv[:, 2 * hd * p:2 * hd * (p + 1)]
        k_pair = qkv[:, d + 2 * hd * p:d + 2 * hd * (p + 1)]
        v_pair = qkv[:, 2 * d + 2 * hd * p:2 * d + 2 * hd * (p + 1)]
        for g in range(group):
            qs = q_pair[g * s_pad:(g + 1) * s_pad]
            ks = k_pair[g * s_pad:(g + 1) * s_pad]
            vs = v_pair[g * s_pad:(g + 1) * s_pad]
            o_pair = None
            for sub in range(2):
                hmask = (lane >= sub * hd) & (lane < (sub + 1) * hd)
                qh = jnp.where(hmask, qs, 0)
                logits = jax.lax.dot_general(
                    qh, ks, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                logits = jnp.where(seq_mask, logits, _NEG_INF)
                m = jnp.max(logits, axis=-1, keepdims=True)
                pr = jnp.exp(logits - m)
                pr = (pr / jnp.sum(pr, axis=-1, keepdims=True)).astype(x.dtype)
                vh = jnp.where(hmask, vs, 0)
                contrib = jax.lax.dot_general(
                    pr, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_pair = contrib if o_pair is None else o_pair + contrib
            oall_scr[g * s_pad:(g + 1) * s_pad,
                     2 * hd * p:2 * hd * (p + 1)] = o_pair.astype(x.dtype)

    out = jax.lax.dot_general(
        oall_scr[:], wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gate = gate_ref[0, 0].astype(jnp.float32)
    out = out + bproj_ref[:].astype(jnp.float32)
    o_ref[:] = (x2.astype(jnp.float32) + gate * out).astype(o_ref.dtype).reshape(
        group, s_pad, d)


def fused_attn_block_v2(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: jax.Array,
    num_heads: int,
    *,
    eps: float = 1e-12,
    gate: jax.Array | float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """v2 of ``fused_attn_block`` — same contract, full-MXU projections.
    Requires an even head count (head-pair tiling); ``fused_attn_block``
    remains for odd-head configs."""
    b, s, d = x.shape
    if num_heads % 2:
        raise ValueError("fused_attn_block_v2 needs an even head count")
    s_pad = max(-(-s // 128) * 128, 128)
    group = GROUP_BATCH
    while b % group:
        group //= 2

    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x
    gate_arr = jnp.asarray(gate, jnp.float32).reshape(1, 1)

    x_spec = pl.BlockSpec((group, s_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, num_heads=num_heads, seq_len=s,
                          eps=eps, group=group),
        grid=(b // group,),
        in_specs=[
            x_spec,
            full(d), full(d),
            full(d, 3 * d), full(3 * d),
            full(d, d), full(d),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((group * s_pad, d), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * d * 4 * d
            + 4 * b * num_heads * s_pad * s_pad * (d // num_heads),
            bytes_accessed=2 * b * s_pad * d * x.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(xp, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
      gate_arr)
    return out[:, :s, :]


def fused_attn_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: jax.Array,
    num_heads: int,
    *,
    eps: float = 1e-12,
    gate: jax.Array | float = 1.0,
) -> jax.Array:
    """x [b, s, d] -> x + gate * proj(attention(LN(x))), one kernel launch.

    ``qkv_kernel`` [d, 3d] (q|k|v interleaved-by-head HF layout) and
    ``proj_kernel`` [d, d] are re-laid-out per head outside the kernel.
    """
    b, s, d = x.shape
    hd = d // num_heads
    s_pad = max(-(-s // 128) * 128, 128)
    group = GROUP_BATCH
    while b % group:
        group //= 2

    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x
    gate_arr = jnp.asarray(gate, jnp.float32).reshape(1, 1)

    # Pre-split weights per head: [d, 3d] -> 3 x [heads, d, hd];
    # [d, d] -> [heads, hd, d]. Lane dims stay 128-aligned inside the kernel.
    wq, wk, wv = jnp.split(qkv_kernel, 3, axis=1)
    split_in = lambda w: w.reshape(d, num_heads, hd).transpose(1, 0, 2)
    wq, wk, wv = split_in(wq), split_in(wk), split_in(wv)
    wproj = proj_kernel.reshape(num_heads, hd, d)
    bqkv = qkv_bias.reshape(3, num_heads, hd)

    x_spec = pl.BlockSpec((group, s_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, seq_len=s,
                          eps=eps, group=group),
        grid=(b // group,),
        in_specs=[
            x_spec,
            full(d), full(d),                          # ln scale/bias
            full(num_heads, d, hd), full(num_heads, d, hd),
            full(num_heads, d, hd), full(3, num_heads, hd),
            full(num_heads, hd, d), full(d),           # proj
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((group * s_pad, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * d * 4 * d + 4 * b * num_heads * s_pad * s_pad * hd,
            bytes_accessed=2 * b * s_pad * d * x.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
    )(xp, ln_scale, ln_bias, wq, wk, wv, bqkv, wproj, proj_bias, gate_arr)
    return out[:, :s, :]
