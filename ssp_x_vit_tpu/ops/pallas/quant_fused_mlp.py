"""Pallas TPU fused int8 SwiGLU MLP for decode: gate + up + silu + down in
ONE kernel pass.

At b=1 decode the MLP is the dominant byte stream (3 d*f int8 matrices per
layer ~ 60% of a llama block). The XLA path runs three dots with the [m, f]
intermediates bouncing through fusion boundaries; this kernel tiles the f
axis and accumulates the down contraction in VMEM — the intermediates never
exist at full width anywhere, and each weight byte is read exactly once.

    out = (silu(x @ gq * gs) * (x @ uq * us)) @ dq * ds

The f-axis is associative for the down contraction, so grid = (f_tiles,)
with an [m, d] f32 accumulator in scratch. Per-out-channel scales: gate/up
scales are per f-column (applied on the tile), down scale per d-column
(applied once at the end).

Contract == the jnp/XLA path in serve._layer_step exactly (same epilogue
formulation); dispatched for int8 UNPACKED llama pytrees at decode shapes
when measured to win (ops/dispatch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, gq_ref, gs_ref, uq_ref, us_ref, dq_ref, ds_ref, o_ref,
            acc, *, n_tiles: int, out_dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]                                        # [m, d]
    g = jnp.dot(x, gq_ref[...].astype(x.dtype),
                preferred_element_type=jnp.float32) * gs_ref[...]
    u = jnp.dot(x, uq_ref[...].astype(x.dtype),
                preferred_element_type=jnp.float32) * us_ref[...]
    h = (jax.nn.silu(g) * u).astype(x.dtype)              # [m, tf]
    acc[...] += jnp.dot(h, dq_ref[...].astype(x.dtype),
                        preferred_element_type=jnp.float32)

    @pl.when(t == n_tiles - 1)
    def _finish():
        o_ref[...] = (acc[...] * ds_ref[...]).astype(out_dtype)


def fused_mlp_int8(x, gate_q, gate_s, up_q, up_s, down_q, down_s, *,
                   f_tile: int = 512, interpret: bool = False):
    """x [.., d] float; gate_q/up_q [d, f] int8 with [f] scales; down_q
    [f, d] int8 with [d] scale. Returns [.., d] in x.dtype."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    f = gate_q.shape[-1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    mt = -(-m // 8) * 8
    while f % f_tile:
        f_tile //= 2
    n_tiles = f // f_tile

    out = pl.pallas_call(
        functools.partial(_kernel, n_tiles=n_tiles, out_dtype=x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((mt, d), lambda t: (0, 0)),
            pl.BlockSpec((d, f_tile), lambda t: (0, t)),
            pl.BlockSpec((1, f_tile), lambda t: (0, t)),
            pl.BlockSpec((d, f_tile), lambda t: (0, t)),
            pl.BlockSpec((1, f_tile), lambda t: (0, t)),
            pl.BlockSpec((f_tile, d), lambda t: (t, 0)),
            pl.BlockSpec((1, d), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((mt, d), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((mt, d), jnp.float32)],
        interpret=interpret,
    )(x2, gate_q, gate_s.astype(jnp.float32).reshape(1, f),
      up_q, up_s.astype(jnp.float32).reshape(1, f),
      down_q, down_s.astype(jnp.float32).reshape(1, d))
    return out.reshape(*lead, d)
