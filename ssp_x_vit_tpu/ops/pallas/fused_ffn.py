"""Pallas TPU fused FFN: fc1 @ GELU @ fc2 with per-neuron importance side-output.

The 2SSP stage-1 importance statistic (per-sample sum over tokens of the
squared intermediate activation, reference src/vit_pruning.py:143-163) is
emitted by the SAME kernel that computes the FFN output: the [s_tile, f_tile]
activation tile lives in VMEM for the fc2 matmul anyway, so the reduction is
one extra VPU pass — no second forward, no hooks, no HBM round-trip of the
[s, f] intermediate.

Grid: (batch, s-tiles, f-tiles), f innermost.
- output tile [s_tile, d] stays VMEM-resident across the f loop (accumulate);
- the stats output uses a constant index map (whole [b, f] array resident in
  VMEM for the entire grid — at most a few MB); each program writes its
  (batch row, f-tile) cell at the first s-tile and accumulates on later ones.

Backward: ``jax.custom_vjp`` falling back to the jnp reference's autodiff.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7, fp32 floor).

    Mosaic has no erf/erfc primitive; exp is supported, so exact GELU is
    reconstructed from this approximation inside the kernel.
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """0.5*x*(1+erf(x/sqrt(2))) — matches jax.nn.gelu(approximate=False)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ffn_kernel(
    x_ref, fc1_ref, b1_ref, fc2_ref, b2_ref, mask_ref,
    out_ref, stats_ref,
    *, seq_len: int, s_tile: int, with_stats: bool,
):
    ib = pl.program_id(0)
    is_ = pl.program_id(1)
    jf = pl.program_id(2)
    f_tile = fc1_ref.shape[1]

    x = x_ref[0]            # [s_tile, d]
    w1 = fc1_ref[:]         # [d, f_tile]
    w2 = fc2_ref[:]         # [f_tile, d]

    h = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = h + b1_ref[:].astype(jnp.float32)  # [1, f_tile] broadcasts over rows
    h = _gelu_exact(h)

    # Zero padded token rows: they carry gelu(b1) != 0 otherwise, which would
    # contaminate both the stats and (harmlessly but wastefully) the output.
    row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) + is_ * s_tile
    h = jnp.where(row < seq_len, h, 0.0)

    if with_stats:
        partial = jnp.sum(jnp.square(h), axis=0, keepdims=True)  # [1, f_tile]
        cols = pl.ds(jf * f_tile, f_tile)

        @pl.when(is_ == 0)
        def _():
            stats_ref[pl.ds(ib, 1), cols] = partial

        @pl.when(is_ > 0)
        def _():
            stats_ref[pl.ds(ib, 1), cols] += partial

    h = h * mask_ref[:].astype(jnp.float32)

    contrib = jax.lax.dot_general(
        h.astype(x.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jf == 0)
    def _():
        out_ref[0] = (contrib + b2_ref[:].astype(jnp.float32)).astype(out_ref.dtype)

    @pl.when(jf > 0)
    def _():
        out_ref[0] = (out_ref[0].astype(jnp.float32) + contrib).astype(out_ref.dtype)


def _ffn_block_kernel(
    x_ref, lns_ref, lnb_ref, fc1_ref, b1_ref, fc2_ref, b2_ref, mask_ref,
    gate_ref, out_ref, stats_ref, y_scr,
    *, seq_len: int, s_tile: int, with_stats: bool, eps: float,
):
    """Full MLP residual branch: out = x + gate * fc2(gelu(fc1(LN(x)))).

    Same grid/accumulation scheme as ``_ffn_kernel``; the LayerNorm is
    computed once per (batch, s-tile) at the first f-tile and cached in a
    VMEM scratch so later f-tiles reuse it."""
    ib = pl.program_id(0)
    is_ = pl.program_id(1)
    jf = pl.program_id(2)
    f_tile = fc1_ref.shape[1]

    x = x_ref[0]            # [s_tile, d] pre-LN residual input

    @pl.when(jf == 0)
    def _():
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
        y_scr[:] = y.astype(y_scr.dtype)

    y = y_scr[:]

    h = jax.lax.dot_general(
        y, fc1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = h + b1_ref[:].astype(jnp.float32)
    h = _gelu_exact(h)

    row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) + is_ * s_tile
    h = jnp.where(row < seq_len, h, 0.0)

    if with_stats:
        partial = jnp.sum(jnp.square(h), axis=0, keepdims=True)
        cols = pl.ds(jf * f_tile, f_tile)

        @pl.when(is_ == 0)
        def _():
            stats_ref[pl.ds(ib, 1), cols] = partial

        @pl.when(is_ > 0)
        def _():
            stats_ref[pl.ds(ib, 1), cols] += partial

    h = h * mask_ref[:].astype(jnp.float32)

    contrib = jax.lax.dot_general(
        h.astype(y.dtype), fc2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gate = gate_ref[0, 0].astype(jnp.float32)

    @pl.when(jf == 0)
    def _():
        out_ref[0] = (x.astype(jnp.float32)
                      + gate * (contrib + b2_ref[:].astype(jnp.float32))
                      ).astype(out_ref.dtype)

    @pl.when(jf > 0)
    def _():
        out_ref[0] = (out_ref[0].astype(jnp.float32)
                      + gate * contrib).astype(out_ref.dtype)


# Tile sizes from the on-chip sweep (docs/tpu_notes.md): s_tile=256 keeps the
# whole padded ViT sequence in one block (no out-block revisit across s);
# f_tile=1536 halves f-loop revisits while staying within VMEM with the
# stats accumulator resident. Measured 5.47ms vs 6.36ms XLA at ViT-B b=256.
S_TILE = 256
F_TILE = 1536


def _fused_ffn_forward(x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask, collect_stats):
    b, s, d = x.shape
    f = fc1_kernel.shape[1]

    s_tile = S_TILE if s > S_TILE else _round_up(s, 8)
    s_pad = _round_up(s, s_tile)
    # Pick the largest f-tile (<= F_TILE, multiple of 128) that does not pad
    # beyond the minimal 128-aligned width — a fixed tile can nearly DOUBLE
    # the work for pruned widths (e.g. f=1622 with tile 1536 pads to 3072).
    min_pad = _round_up(f, 128)
    f_tile, f_pad = 128, min_pad
    for t in range(F_TILE, 0, -128):
        if _round_up(f, t) == min_pad:
            f_tile, f_pad = t, min_pad
            break

    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x
    w1 = jnp.pad(fc1_kernel, ((0, 0), (0, f_pad - f))) if f_pad != f else fc1_kernel
    w2 = jnp.pad(fc2_kernel, ((0, f_pad - f), (0, 0))) if f_pad != f else fc2_kernel
    b1 = fc1_bias if fc1_bias is not None else jnp.zeros((f,), x.dtype)
    b1 = jnp.pad(b1, (0, f_pad - f)) if f_pad != f else b1
    b2 = fc2_bias if fc2_bias is not None else jnp.zeros((d,), x.dtype)
    # Padded neurons masked to 0 so they contribute nothing to fc2.
    mask = neuron_mask if neuron_mask is not None else jnp.ones((f,), jnp.float32)
    mask = jnp.broadcast_to(mask, (f,)).astype(jnp.float32)
    mask = jnp.pad(mask, (0, f_pad - f)) if f_pad != f else mask
    # 2-D operands for TPU (sublane, lane) tiling.
    b1, b2, mask = b1.reshape(1, -1), b2.reshape(1, -1), mask.reshape(1, -1)

    ns, nf = s_pad // s_tile, f_pad // f_tile

    out, stats_partial = pl.pallas_call(
        functools.partial(
            _ffn_kernel, seq_len=s, s_tile=s_tile, with_stats=collect_stats
        ),
        grid=(b, ns, nf),
        in_specs=[
            pl.BlockSpec((1, s_tile, d), lambda ib, is_, jf: (ib, is_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f_tile), lambda ib, is_, jf: (0, jf), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_tile), lambda ib, is_, jf: (0, jf), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, d), lambda ib, is_, jf: (jf, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ib, is_, jf: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_tile), lambda ib, is_, jf: (0, jf), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s_tile, d), lambda ib, is_, jf: (ib, is_, 0), memory_space=pltpu.VMEM),
            # Constant index map: the whole stats array stays VMEM-resident
            # across the grid, making cross-step accumulation well-defined.
            pl.BlockSpec((b, f_pad), lambda ib, is_, jf: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
            jax.ShapeDtypeStruct((b, f_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s_pad * d * f_pad,
            bytes_accessed=(b * s_pad * d * 2 + d * f_pad * 2) * x.dtype.itemsize,
            transcendentals=b * s_pad * f_pad,
        ),
    )(xp, w1, b1, w2, b2, mask)

    out = out[:, :s, :]
    stats = stats_partial[:, :f] if collect_stats else None
    return out, stats


def _jnp_ffn(x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask):
    from ssp_x_vit_tpu.ops.ffn import ffn_forward

    out, _ = ffn_forward(
        x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
        neuron_mask=neuron_mask, collect_stats=False, use_pallas_kernel=False,
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused(x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask, collect_stats):
    return _fused_ffn_forward(x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask, collect_stats)


def _fused_fwd(x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask, collect_stats):
    out = _fused_ffn_forward(x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask, collect_stats)
    return out, (x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask)


def _fused_bwd(collect_stats, res, g):
    x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask = res
    g_out, _ = g  # no gradient flows through the stats side-output
    diff_args = (x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias)
    has_b1, has_b2 = fc1_bias is not None, fc2_bias is not None

    def f(x_, w1, b1, w2, b2):
        return _jnp_ffn(x_, w1, b1 if has_b1 else None, w2, b2 if has_b2 else None, neuron_mask)

    b1 = fc1_bias if has_b1 else jnp.zeros((fc1_kernel.shape[1],), x.dtype)
    b2 = fc2_bias if has_b2 else jnp.zeros((fc2_kernel.shape[1],), x.dtype)
    _, vjp = jax.vjp(f, x, fc1_kernel, b1, fc2_kernel, b2)
    dx, dw1, db1, dw2, db2 = vjp(g_out)
    return (dx, dw1, db1 if has_b1 else None, dw2, db2 if has_b2 else None, None)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ffn(
    x: jax.Array,
    fc1_kernel: jax.Array,
    fc1_bias: Optional[jax.Array],
    fc2_kernel: jax.Array,
    fc2_bias: Optional[jax.Array],
    *,
    neuron_mask: Optional[jax.Array] = None,
    collect_stats: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Same contract as ops.ffn.ffn_forward (jnp reference)."""
    return _fused(x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask, collect_stats)


def _fused_ffn_block_forward(x, ln_scale, ln_bias, fc1_kernel, fc1_bias,
                             fc2_kernel, fc2_bias, neuron_mask, gate,
                             collect_stats, eps):
    b, s, d = x.shape
    f = fc1_kernel.shape[1]

    s_tile = S_TILE if s > S_TILE else _round_up(s, 8)
    s_pad = _round_up(s, s_tile)
    min_pad = _round_up(f, 128)
    f_tile, f_pad = 128, min_pad
    for t in range(F_TILE, 0, -128):
        if _round_up(f, t) == min_pad:
            f_tile, f_pad = t, min_pad
            break

    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x
    w1 = jnp.pad(fc1_kernel, ((0, 0), (0, f_pad - f))) if f_pad != f else fc1_kernel
    w2 = jnp.pad(fc2_kernel, ((0, f_pad - f), (0, 0))) if f_pad != f else fc2_kernel
    b1 = fc1_bias if fc1_bias is not None else jnp.zeros((f,), x.dtype)
    b1 = jnp.pad(b1, (0, f_pad - f)) if f_pad != f else b1
    b2 = fc2_bias if fc2_bias is not None else jnp.zeros((d,), x.dtype)
    mask = neuron_mask if neuron_mask is not None else jnp.ones((f,), jnp.float32)
    mask = jnp.broadcast_to(mask, (f,)).astype(jnp.float32)
    mask = jnp.pad(mask, (0, f_pad - f)) if f_pad != f else mask
    b1, b2, mask = b1.reshape(1, -1), b2.reshape(1, -1), mask.reshape(1, -1)
    lns = ln_scale.reshape(1, -1)
    lnb = ln_bias.reshape(1, -1)
    gate_arr = jnp.asarray(gate, jnp.float32).reshape(1, 1)

    ns, nf = s_pad // s_tile, f_pad // f_tile

    out, stats_partial = pl.pallas_call(
        functools.partial(
            _ffn_block_kernel, seq_len=s, s_tile=s_tile,
            with_stats=collect_stats, eps=eps,
        ),
        grid=(b, ns, nf),
        in_specs=[
            pl.BlockSpec((1, s_tile, d), lambda ib, is_, jf: (ib, is_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ib, is_, jf: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ib, is_, jf: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f_tile), lambda ib, is_, jf: (0, jf), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_tile), lambda ib, is_, jf: (0, jf), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, d), lambda ib, is_, jf: (jf, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ib, is_, jf: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_tile), lambda ib, is_, jf: (0, jf), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda ib, is_, jf: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s_tile, d), lambda ib, is_, jf: (ib, is_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, f_pad), lambda ib, is_, jf: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
            jax.ShapeDtypeStruct((b, f_pad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((s_tile, d), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s_pad * d * f_pad,
            bytes_accessed=(b * s_pad * d * 2 + d * f_pad * 2) * x.dtype.itemsize,
            transcendentals=b * s_pad * f_pad,
        ),
    )(xp, lns, lnb, w1, b1, w2, b2, mask, gate_arr)

    out = out[:, :s, :]
    stats = stats_partial[:, :f] if collect_stats else None
    return out, stats


def _jnp_ffn_block(x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel,
                   fc2_bias, neuron_mask, gate, eps):
    from ssp_x_vit_tpu.ops.common import layer_norm

    y = layer_norm(x, ln_scale, ln_bias, eps)
    out = _jnp_ffn(y, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias, neuron_mask)
    return x + jnp.asarray(gate, x.dtype) * out


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_block(x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel,
                 fc2_bias, neuron_mask, gate, collect_stats, eps):
    return _fused_ffn_block_forward(x, ln_scale, ln_bias, fc1_kernel, fc1_bias,
                                    fc2_kernel, fc2_bias, neuron_mask, gate,
                                    collect_stats, eps)


def _fused_block_fwd(x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel,
                     fc2_bias, neuron_mask, gate, collect_stats, eps):
    out = _fused_ffn_block_forward(x, ln_scale, ln_bias, fc1_kernel, fc1_bias,
                                   fc2_kernel, fc2_bias, neuron_mask, gate,
                                   collect_stats, eps)
    return out, (x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel,
                 fc2_bias, neuron_mask, gate)


def _fused_block_bwd(collect_stats, eps, res, g):
    (x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
     neuron_mask, gate) = res
    g_out, _ = g
    has_b1, has_b2 = fc1_bias is not None, fc2_bias is not None

    def f(x_, lns, lnb, w1, b1, w2, b2, gate_):
        return _jnp_ffn_block(x_, lns, lnb, w1, b1 if has_b1 else None, w2,
                              b2 if has_b2 else None, neuron_mask, gate_, eps)

    b1 = fc1_bias if has_b1 else jnp.zeros((fc1_kernel.shape[1],), x.dtype)
    b2 = fc2_bias if has_b2 else jnp.zeros((fc2_kernel.shape[1],), x.dtype)
    _, vjp = jax.vjp(f, x, ln_scale, ln_bias, fc1_kernel, b1, fc2_kernel, b2,
                     jnp.asarray(gate, jnp.float32))
    dx, dlns, dlnb, dw1, db1, dw2, db2, dgate = vjp(g_out)
    return (dx, dlns, dlnb, dw1, db1 if has_b1 else None, dw2,
            db2 if has_b2 else None, None, dgate)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_ffn_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    fc1_kernel: jax.Array,
    fc1_bias: Optional[jax.Array],
    fc2_kernel: jax.Array,
    fc2_bias: Optional[jax.Array],
    *,
    neuron_mask: Optional[jax.Array] = None,
    gate: jax.Array | float = 1.0,
    collect_stats: bool = False,
    eps: float = 1e-12,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full MLP residual branch in one kernel:
    ``out = x + gate * fc2(gelu(fc1(LN(x))))`` with the stage-1 importance
    side-output. Saves the LN round-trip and the residual re-read vs
    LN-outside + fused_ffn."""
    return _fused_block(x, ln_scale, ln_bias, fc1_kernel, fc1_bias,
                        fc2_kernel, fc2_bias, neuron_mask, gate,
                        collect_stats, eps)
