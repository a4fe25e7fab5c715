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
(high nibble), two's complement in [-8, 7] — split-half packing so the
in-kernel unpack is a CONCAT of the two nibble planes along K (cheap,
layout-preserving) rather than a row interleave. HBM traffic: K*N/2 bytes.

Grid: (M-tiles, N-tiles); K unsplit (each weight byte enters VMEM once).
"""

from __future__ import annotations

import functools

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
    """int4: w_ref [K//2, TN] int8, low nibble = rows [0, K/2), high nibble =
    rows [K/2, K). x_ref columns follow the same natural row order. Nibble
    unpack widens to int32 (Mosaic has no int8 shift ops — int8-domain
    shifts fail to compile on this stack) then shift-sign-extends."""
    packed = w_ref[...].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(packed, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(packed, 24), 28)
    w = jnp.concatenate([lo, hi], axis=0).astype(x_ref.dtype)
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...]).astype(out_dtype)


def _float_unpack(packed_i8, dtype):
    """Nibble unpack entirely in FLOAT VPU ops — every intermediate is an
    integer <= 127 in magnitude, exact in bf16 (8 mantissa bits):
        p   = 16*hi + lo_u   (hi in [-8,7] signed, lo_u in [0,15])
        hi  = floor(p / 16)
        lo  = (p - 16*hi) - 16*[lo_u >= 8]
    Avoids the int32 widen + 4 shifts of the integer path (32-bit lanes)."""
    p = packed_i8.astype(dtype)
    # python-float constants stay weakly typed -> arithmetic remains `dtype`
    hi = jnp.floor(p * (1.0 / 16.0))
    lo_u = p - hi * 16.0
    lo = jnp.where(lo_u >= 8.0, lo_u - 16.0, lo_u)
    return lo, hi


def _qmm4_kernel_funpack(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    """int4 with the float-domain unpack, single concatenated dot."""
    lo, hi = _float_unpack(w_ref[...], x_ref.dtype)
    w = jnp.concatenate([lo, hi], axis=0)
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...]).astype(out_dtype)


def _qmm4_kernel_fsplit(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    """int4 float unpack, two half-K dots (no VMEM concat copy)."""
    lo, hi = _float_unpack(w_ref[...], x_ref.dtype)
    kk = w_ref.shape[0]
    x = x_ref[...]
    acc = jnp.dot(x[:, :kk], lo, preferred_element_type=jnp.float32) \
        + jnp.dot(x[:, kk:], hi, preferred_element_type=jnp.float32)
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
    """[K, N] int8 values in [-8, 7] -> [K//2, N] packed int8: low nibble =
    row k, high nibble = row k + K/2 (split-half). K must be even."""
    k, n = w_q4.shape
    assert k % 2 == 0, "int4 packing needs even K"
    lo = w_q4[: k // 2].astype(jnp.int32) & 0xF
    hi = w_q4[k // 2:].astype(jnp.int32) & 0xF
    return ((hi << 4) | lo).astype(jnp.int8)


def unpack_int4(w_p):
    """Inverse of pack_int4 -> [K, N] int8 in [-8, 7]."""
    p = w_p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(p, 24), 28)
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def quantize_weight_int4(w):
    """Symmetric per-output-channel int4: returns (packed [K//2, N] int8,
    scale [N] f32)."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -8, 7).astype(jnp.int8)
    return pack_int4(q), scale


def quant4_matmul(x, w_p, scale, *, unpack: str = "split",
                  interpret: bool = False):
    """(x @ unpack(w_p).astype(x.dtype)) * scale. w_p [K//2, N] packed.

    ``unpack``: "int32" (widen + shifts), "float" (float-domain nibble math,
    one concatenated dot) or "split" (float unpack, two half-K dots — the
    measured-fastest default, scripts/tpu_int4_probe.py)."""
    kk, n = w_p.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, kk * 2)
    out = _run(_QMM4_KERNELS[unpack], x2, w_p,
               scale.astype(jnp.float32).reshape(1, n),
               kk, n, x.dtype, interpret=interpret)
    return out.reshape(*lead, n)
