"""Multi-head attention for the ViT/LLM forward passes.

jnp reference implementation here; the Pallas flash-attention kernel lives in
``ops/pallas/flash_attention.py`` and is selected via ``ops.dispatch`` for TPU
runs with long enough sequences to benefit.

Replaces the reference's per-module torch attention (HF ViTAttention /
LlamaAttention); the "attention bypass" of the reference
(src/vit_pruning.py:416-429, src/utilities.py:81-96) is NOT implemented here —
block skipping is a gate on the residual branch in the model forward, so the
same compiled program evaluates any skip pattern.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def multi_head_attention(
    x: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: Optional[jax.Array],
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array],
    num_heads: int,
    *,
    causal: bool = False,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Fused-QKV multi-head self attention.

    Args:
        x: [batch, seq, hidden]
        qkv_kernel: [hidden, 3*hidden] (q|k|v concatenated on the output axis)
        qkv_bias: [3*hidden] or None
        proj_kernel: [hidden, hidden]
        proj_bias: [hidden] or None
        num_heads: number of attention heads
        causal: apply causal mask (LLM path)
        use_flash: override kernel dispatch (None = auto)

    Returns:
        [batch, seq, hidden]
    """
    b, s, d = x.shape
    head_dim = d // num_heads

    qkv = jnp.einsum("bsd,df->bsf", x, qkv_kernel.astype(x.dtype))
    if qkv_bias is not None:
        qkv = qkv + qkv_bias.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)

    if use_flash is None:
        from ssp_x_vit_tpu.ops.dispatch import FLASH_MIN_SEQ, use_pallas

        use_flash = use_pallas() and s >= FLASH_MIN_SEQ
    if use_flash:
        from ssp_x_vit_tpu.ops.pallas.flash_attention import flash_attention

        out = flash_attention(q, k, v, causal=causal)
    else:
        out = sdpa_reference(q, k, v, causal=causal)

    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    out = jnp.einsum("bsd,de->bse", out, proj_kernel.astype(x.dtype))
    if proj_bias is not None:
        out = out + proj_bias.astype(x.dtype)
    return out


def sdpa_reference(q: jax.Array, k: jax.Array, v: jax.Array, *, causal: bool = False,
                   window=None, softcap: Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention, fp32 softmax ([b, h, s, hd] layout).

    ``window`` adds sliding-window attention (mistral, HF convention:
    query position q attends keys k with ``k <= q`` and ``q - k < window``,
    i.e. the most recent ``window`` positions including itself); it may be a
    TRACED int scalar (mixed per-layer windows ride the layer scan). Requires
    ``causal=True``. ``softcap`` applies gemma-2 logit soft-capping
    ``cap * tanh(logits / cap)`` before the mask."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if softcap is not None:
        logits = softcap * jnp.tanh(logits / softcap)
    if causal:
        s = q.shape[2]
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        if window is not None:
            qi = jnp.arange(s)[:, None]
            ki = jnp.arange(s)[None, :]
            mask = mask & (qi - ki < window)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    elif window is not None:
        raise ValueError("sliding window requires causal attention")
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)
