"""Shared primitive ops: layernorm, GELU, patch extraction.

These are deliberately plain jnp — XLA fuses elementwise chains into the
surrounding matmuls on TPU, so hand-writing kernels for them would not beat the
compiler. Pallas is reserved for attention and the FFN-with-importance op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU, matching HF ViT's default activation.

    The reference model family (google/vit-base-patch16-224 and timm AugReg
    ViTs) uses exact GELU, not the tanh approximation.
    """
    return jax.nn.gelu(x, approximate=False)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-12) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics.

    Statistics are computed in fp32 regardless of input dtype (bf16-safe),
    output is cast back to the input dtype.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """[batch, H, W, C] -> [batch, num_patches, patch_size*patch_size*C].

    Pure reshape/transpose; the subsequent patch-embedding matmul is the
    MXU-friendly replacement for the reference's Conv2d patch projection
    (a stride-P conv is exactly a matmul over non-overlapping patches).

    Patch pixel ordering matches a torch Conv2d kernel flattened as
    (C, P, P) -> C*P*P, so checkpoint weights can be reshaped to
    [C*P*P, hidden] once at load time (see models/checkpoints.py).
    """
    b, h, w, c = pixel_values.shape
    p = patch_size
    if h % p or w % p:
        raise ValueError(f"image size {(h, w)} not divisible by patch size {p}")
    gh, gw = h // p, w // p
    x = pixel_values.reshape(b, gh, p, gw, p, c)
    # -> [b, gh, gw, C, p, p] so the flattened patch matches torch's
    # Conv2d weight layout (out, C, P, P) flattened over (C, P, P).
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, gh * gw, c * p * p)


def mm_quant(x, bp, name, compute_dtype):
    """Generic projection matmul over a param dict, transparently handling
    weight-only quantized entries (llm/quant.py, models/quant.py):
    ``<name>_q`` int8 with per-out-channel ``<name>_scale`` applied in the
    epilogue (the weight-side graph is a convert XLA fuses into the dot);
    ``<name>_q4`` packed-int4 via the pallas dequant kernel."""
    w_q = bp.get(name + "_q")
    if w_q is not None:
        from ssp_x_vit_tpu.ops.dispatch import use_w8a8

        if use_w8a8():
            return w8a8_matmul(x, w_q, bp[name + "_scale"], compute_dtype)
        return (x @ w_q.astype(compute_dtype)) * \
            bp[name + "_scale"].astype(compute_dtype)
    w_p = bp.get(name + "_q4")
    if w_p is not None:
        from ssp_x_vit_tpu.ops.dispatch import use_pallas
        from ssp_x_vit_tpu.ops.pallas.quant_matmul import quant4_matmul

        return quant4_matmul(x, w_p, bp[name + "_scale"],
                             interpret=not use_pallas())
    return x @ bp[name].astype(compute_dtype)


def w8a8_matmul(x, w_q, w_scale, compute_dtype):
    """Native int8-MXU matmul with DYNAMIC per-token activation quantization:
    ``y = (round(x/sx) @ w_q) * sx * sw`` with sx = absmax(x, -1)/127.
    int8 x int8 -> int32 runs at ~1.3x the bf16 MXU rate on this chip
    (measured, docs/tpu_notes.md); the quant/dequant epilogues fuse on the
    VPU. Opt-in via dispatch.set_w8a8_enabled — activation quantization is
    lossy (unlike the weight-only epilogue-scale path)."""
    import jax as _jax

    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(ax > 0, ax / 127.0, 1.0)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = _jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    return (acc * sx * w_scale.astype(jnp.float32)).astype(compute_dtype)


def pick_param_variants(blocks, bases, idx):
    """Per-layer param dict copying whichever storage variant each base key
    has (plain / ``_q`` int8 / ``_q4`` packed int4, + ``_scale``) — the one
    suffix walk shared by the ViT and LLM materialized forwards, so quantized
    pytrees flow through both unchanged."""
    bp = {}
    for base in bases:
        for suf in ("", "_q", "_q4", "_scale"):
            if base + suf in blocks:
                bp[base + suf] = blocks[base + suf][idx]
    return bp
