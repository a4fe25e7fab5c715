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
