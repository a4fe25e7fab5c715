"""Pallas TPU weight-only quantized matmul: x @ dequant(w_q) * scale.

Decode-time projections stream the full weight matrix for a handful of
activation rows, so the op is HBM-bound: the kernel's job is to move int8
weight bytes at line rate and dequantize in VMEM on the way to the MXU.
XLA already fuses the int8->bf16 convert into its dot (serve._mm measured
1.57x at b=1, docs/tpu_notes.md); this kernel exists to chase the remaining
bandwidth headroom and as the substrate for int4 (packed nibbles — a layout
XLA will NOT fuse through).

Contract (matches serve._mm's epilogue-scale formulation exactly):
    quant_matmul(x [.., K] f, w_q [K, N] int8, scale [N] f32) -> [.., N] f
    == (x @ w_q.astype(f)) * scale

int4 variant: one int8 byte packs rows ``k`` (low nibble) and ``k + K/2``
(high nibble) — split-half packing so the in-kernel unpack is a CONCAT of
the two nibble planes along K (cheap, layout-preserving) rather than a row
interleave. HBM traffic: K*N/2 bytes. The low nibble is stored BIASED
(+8, in [0,15]) and the high nibble two's-complement, so the byte value is
exactly ``16*hi + (lo+8)``: the float-domain unpack needs only
convert/floor/fma (no sign-fixup compare+select), and the -8 de-bias folds
into a per-row dot epilogue (``- 8 * sum(x_lo)``) in the split kernel.

Grid: (M-tiles, N-tiles); K unsplit (each weight byte enters VMEM once).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_tile(n: int, candidates=(512, 256, 128)) -> int:
    for t in candidates:
        if n % t == 0:
            return t
    return n  # small / odd N: single tile


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    # int8 -> x-dtype convert feeds the MXU directly (bf16 passes in
    # production, f32 accum); int8 values are exact in bf16 (|v| <= 127).
    w = w_ref[...].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...]).astype(out_dtype)


def _qmm4_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    """int4: w_ref [K//2, TN] int8, low nibble (biased +8) = rows [0, K/2),
    high nibble (two's complement) = rows [K/2, K). x_ref columns follow the
    same natural row order. Integer unpack widens to int32 (Mosaic has no
    int8 shift ops — int8-domain shifts fail to compile on this stack)."""
    packed = w_ref[...].astype(jnp.int32)
    lo = (packed & 15) - 8
    hi = jnp.right_shift(jnp.left_shift(packed, 24), 28)
    w = jnp.concatenate([lo, hi], axis=0).astype(x_ref.dtype)
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...]).astype(out_dtype)


def _float_unpack_biased(packed_i8):
    """Nibble unpack entirely in FLOAT VPU ops — every intermediate is an
    integer <= 127 in magnitude, exact even in bf16 (8 mantissa bits):
        p    = 16*hi + lo_b    (hi in [-8,7] signed, lo_b = lo+8 in [0,15])
        hi   = floor(p / 16)
        lo_b = p - 16*hi       (one fma)
    Three VPU ops per byte (convert, mul+floor, fma) — no compare/select
    sign fixup thanks to the biased storage; callers de-bias via an
    elementwise -8 or the dot epilogue ``- 8 * sum(x_lo)``. f32 domain:
    Mosaic rejects bf16 floor on this stack."""
    p = packed_i8.astype(jnp.float32)
    hi = jnp.floor(p * (1.0 / 16.0))
    lo_b = p - hi * 16.0
    return lo_b, hi


def _qmm4_kernel_funpack(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    """int4 with the float-domain unpack, single concatenated dot."""
    lo_b, hi = _float_unpack_biased(w_ref[...])
    w = jnp.concatenate([lo_b - 8.0, hi], axis=0).astype(x_ref.dtype)
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...]).astype(out_dtype)


def _qmm4_kernel_fsplit(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    """int4 float unpack, two half-K dots; the low plane stays BIASED and the
    -8 de-bias becomes a rank-1 epilogue: x@(lo_b - 8) = x@lo_b - 8*sum(x)."""
    lo_b, hi = _float_unpack_biased(w_ref[...])
    kk = w_ref.shape[0]
    x = x_ref[...]
    x_lo = x[:, :kk]
    acc = jnp.dot(x_lo, lo_b.astype(x.dtype), preferred_element_type=jnp.float32) \
        + jnp.dot(x[:, kk:], hi.astype(x.dtype), preferred_element_type=jnp.float32)
    acc = acc - 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[...] = (acc * s_ref[...]).astype(out_dtype)


_QMM4_KERNELS = {"int32": _qmm4_kernel, "float": _qmm4_kernel_funpack,
                 "split": _qmm4_kernel_fsplit}


def _run(kernel, x2, w_q, scale2, k_rows, n, out_dtype, interpret=False):
    m = x2.shape[0]
    mt = min(256, -(-m // 8) * 8)
    nt = _pick_tile(n)
    grid = (-(-m // mt), n // nt)
    return pl.pallas_call(
        functools.partial(kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mt, x2.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((k_rows, nt), lambda i, j: (0, j)),
            pl.BlockSpec((1, nt), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(x2, w_q, scale2)


def quant_matmul(x, w_q, scale, *, interpret: bool = False):
    """(x @ w_q.astype(x.dtype)) * scale via one pallas pass. x [.., K],
    w_q [K, N] int8, scale [N]. ``interpret`` runs the same kernel body
    through the pallas interpreter (CPU tests)."""
    k, n = w_q.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    out = _run(_qmm_kernel, x2, w_q, scale.astype(jnp.float32).reshape(1, n),
               k, n, x.dtype, interpret=interpret)
    return out.reshape(*lead, n)


def pack_int4(w_q4):
    """[..., K, N] int8 values in [-8, 7] -> [..., K//2, N] packed int8: low
    nibble = row k BIASED by +8 (in [0,15]), high nibble = row k + K/2 two's
    complement (split-half). K must be even. Byte value == 16*hi + (lo+8).
    Leading dims are batch (stacked-layer [L, K, N] / expert [L, E, K, N]
    pytrees pack without vmap)."""
    k = w_q4.shape[-2]
    assert k % 2 == 0, "int4 packing needs even K"
    lo = (w_q4[..., : k // 2, :].astype(jnp.int32) + 8) & 0xF
    hi = w_q4[..., k // 2:, :].astype(jnp.int32) & 0xF
    return ((hi << 4) | lo).astype(jnp.int8)


def unpack_int4(w_p):
    """Inverse of pack_int4 -> [..., K, N] int8 in [-8, 7]."""
    p = w_p.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = jnp.right_shift(jnp.left_shift(p, 24), 28)
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def quantize_weight_int4(w):
    """Symmetric per-output-channel int4: returns (packed [..., K//2, N]
    int8, scale [..., N] f32). Per-(batch, out-channel) when leading dims
    are present — e.g. per-(layer, expert, channel) for [L, E, K, N]
    routed-expert stacks."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -8, 7).astype(jnp.int8)
    return pack_int4(q), scale


def quant4_matmul(x, w_p, scale, *, unpack: str | None = None,
                  interpret: bool = False):
    """(x @ unpack(w_p).astype(x.dtype)) * scale. w_p [K//2, N] packed.

    ``unpack``: "int32" (widen + shifts), "float" (float-domain nibble math,
    one concatenated dot) or "split" (float unpack + rank-1 de-bias epilogue,
    two half-K dots). All three measure within noise of each other AND of
    the int8 kernel at decode shapes (scripts/tpu_quant_probe.py — the
    matvec sits on a per-layer latency floor, not the byte stream), so the
    choice is env-tunable: SSP_X_VIT_INT4_UNPACK, default "split"."""
    if unpack is None:
        unpack = os.environ.get("SSP_X_VIT_INT4_UNPACK", "split")
    kk, n = w_p.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, kk * 2)
    out = _run(_QMM4_KERNELS[unpack], x2, w_p,
               scale.astype(jnp.float32).reshape(1, n),
               kk, n, x.dtype, interpret=interpret)
    return out.reshape(*lead, n)
