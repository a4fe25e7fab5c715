"""Token pruning for ViT inference (EViT / attention-aware token filtering).

Accelerates the ViT forward along the TOKEN axis — complementary to the
framework's 2SSP structured WEIGHT pruning (width/depth): attention cost is
quadratic and FFN cost linear in tokens, so dropping inattentive tokens at a
few depths compounds with a width/depth-pruned architecture.

Method (paper-informed; see PAPERS.md):
- "Speed-up of Vision Transformer Models by Attention-aware Token
  Filtering" and EViT: rank patch tokens by the attention the [CLS] query
  pays them; keep the top-K.
- EViT's fusion token: the pruned tokens are not discarded but merged into
  ONE extra token, weighted by their (renormalized) CLS-attention — the
  information survives in compressed form.

TPU-native constraints drive the design: the keep schedule is STATIC
(fixed K per stage -> one compiled program, no dynamic shapes), scoring
reuses the next block's own q/k projection on the layer-normed input (the
exact attention row that block would compute for CLS — no extra learned
predictor, cf. HeatViT's trained gates), and the per-stage forwards reuse
``_block_apply`` so the fused attention/FFN pallas kernels and quantized
pytrees keep working on the shortened sequences.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.models.vit import (
    Params, ViTConfig, _block_apply, apply_head, embed, layer_norm,
)


def cls_attention_scores(x: jax.Array, bp: Params, cfg: ViTConfig) -> jax.Array:
    """[b, s, d] -> [b, s]: mean over heads of the CLS query's attention row
    under ``bp``'s qkv projection (the row the block would compute). Cheap:
    one q-row projection + one [b, h, s] dot — no [s, s] logits."""
    h = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"], cfg.layernorm_eps)
    d = cfg.hidden_size
    if "qkv_kernel" in bp:
        qkv_k = bp["qkv_kernel"].astype(x.dtype)
    else:
        # int8-quantized pytree (models/quant.py): dequantize the q/k halves
        # (per-out-channel scales) — scoring is a tiny side computation, the
        # block itself keeps its int8 epilogue-scale matmuls
        qkv_k = (bp["qkv_kernel_q"].astype(x.dtype)
                 * bp["qkv_kernel_scale"].astype(x.dtype)[None, :])
    q_cls = h[:, 0] @ qkv_k[:, :d]               # [b, d]
    k = h @ qkv_k[:, d:2 * d]                    # [b, s, d]
    if bp.get("qkv_bias") is not None:
        qkv_b = bp["qkv_bias"].astype(x.dtype)
        q_cls = q_cls + qkv_b[:d]
        k = k + qkv_b[d:2 * d]
    nh, hd = cfg.num_heads, cfg.head_dim
    b, s, _ = k.shape
    q_cls = q_cls.reshape(b, nh, hd)
    k = k.reshape(b, s, nh, hd)
    logits = jnp.einsum("bhd,bshd->bhs", q_cls, k) / (hd ** 0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(probs, axis=1)               # [b, s]


def prune_tokens(x: jax.Array, scores: jax.Array, keep: int) -> jax.Array:
    """[b, s, d] -> [b, keep, d]: [CLS] + top-(keep-2) patch tokens by score
    + ONE fusion token merging the pruned tokens (score-weighted mean,
    EViT). ``keep`` is static -> static output shape."""
    b, s, d = x.shape
    if not 2 <= keep < s:
        raise ValueError(f"keep={keep} must be in [2, {s - 1}]")
    patch_scores = scores[:, 1:]                                  # [b, s-1]
    top = jax.lax.top_k(patch_scores, keep - 2)[1]                # [b, keep-2]
    kept = jnp.take_along_axis(x[:, 1:], top[:, :, None], axis=1)

    # fusion token over the complement, weighted by renormalized scores
    mask = jnp.ones((b, s - 1), x.dtype)
    mask = mask.at[jnp.arange(b)[:, None], top].set(0.0)
    w = patch_scores.astype(x.dtype) * mask
    w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-9)
    fused = jnp.einsum("bs,bsd->bd", w, x[:, 1:])[:, None]        # [b, 1, d]

    return jnp.concatenate([x[:, :1], kept, fused], axis=1)


def vit_forward_token_pruned(
    params: Params,
    pixel_values: jax.Array,
    cfg: ViTConfig,
    keep_schedule: Sequence[Tuple[int, int]] = (),
    *,
    compute_dtype=jnp.float32,
    allow_fused_attn: bool = True,
) -> jax.Array:
    """ViT forward with static token pruning: before each layer listed in
    ``keep_schedule`` (pairs of (layer index, kept sequence length)), tokens
    are ranked by that layer's CLS-attention row and pruned to the given
    length (CLS + top tokens + one fusion token). Empty schedule reproduces
    ``vit_forward`` logits. Composes with width-materialized / quantized
    block pytrees (same ``_block_apply``); depth-materialized configs use
    their own unrolled forward."""
    if cfg.pruned_attention_blocks:
        raise ValueError("token pruning + depth-materialized configs: prune "
                         "tokens on the gate-parameterized model instead")
    sched: Dict[int, int] = dict(keep_schedule)
    if len(sched) != len(tuple(keep_schedule)):
        raise ValueError(f"duplicate layer indices in keep_schedule "
                         f"{tuple(keep_schedule)}")
    x = embed(params, cfg, pixel_values, compute_dtype)
    blocks = params["blocks"]

    for i in range(cfg.num_layers):
        bp = {k: v[i] for k, v in blocks.items()}
        if i in sched:
            scores = cls_attention_scores(x, bp, cfg)
            x = prune_tokens(x, scores, sched[i])
        x, _ = _block_apply(
            x, bp, cfg, attn_gate=None, mlp_gate=None, neuron_mask=None,
            collect_ffn_stats=False, allow_fused_attn=allow_fused_attn)

    x = layer_norm(x, params["ln_final_scale"], params["ln_final_bias"],
                   cfg.layernorm_eps)
    return apply_head(params["head"], cfg, x[:, 0])
