"""Functional JAX Vision Transformer with pruning-native forward passes.

Design (TPU-first, not a port — see SURVEY.md §7):

- Parameters are a pytree with all encoder blocks STACKED on a leading axis
  ([num_layers, ...]), so the masked forward is a single ``lax.scan`` over
  blocks: one compiled block program regardless of depth.
- Structured pruning during *search* is expressed as runtime mask arguments
  (``attn_gate``, ``mlp_gate``, ``neuron_mask``) — evaluating any skip pattern
  or neuron subset reuses the same compiled program. This replaces the
  reference's forward monkey-patching (src/utilities.py:69-135), attention
  bypass modules (src/vit_pruning.py:416-429) and per-candidate
  ``copy.deepcopy`` (src/vit_pruning.py:477-496), all of which would force an
  XLA retrace per candidate.
- *Final* pruned models are materialized once: FFN rows/cols gathered to the
  kept width (reference src/vit_pruning.py:297-311 semantics), attention
  weights of depth-pruned blocks physically dropped from the stacked arrays.
  ``vit_forward_materialized`` is an unrolled loop that statically skips those
  blocks' attention — real FLOP savings, one compile per final architecture.

Model semantics match HF ``ViTForImageClassification``
(google/vit-base-patch16-224): conv patch embed (as a patchify+matmul), CLS
token, learned position embeddings, pre-LN encoder blocks with exact GELU,
final LayerNorm, classifier on the CLS token.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.ops.attention import multi_head_attention
from ssp_x_vit_tpu.ops.common import layer_norm, patchify, gelu
from ssp_x_vit_tpu.ops.ffn import ffn_forward

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static model configuration (hashable; safe as a jit static argument)."""

    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_classes: int = 10
    layernorm_eps: float = 1e-12
    # Head: "linear" = single Linear; "adapter" = Linear -> GELU -> Linear
    # bottleneck (reference auto_2ssp.py --adapter / load_cifar_adapter).
    head_type: str = "linear"
    adapter_bottleneck: int = 0
    # --- materialized-pruning state (empty for a dense model) ---
    # Logical kept intermediate size per block after stage-1 width pruning.
    # None = dense (all == intermediate_size). Physical arrays are padded to
    # max(block_intermediate_sizes); padding rows/cols are zero so they are
    # mathematically inert. Parameter accounting uses the logical sizes.
    block_intermediate_sizes: Optional[Tuple[int, ...]] = None
    # Blocks whose attention was materially removed in stage-2. Their
    # attention weights are absent from the stacked attention arrays.
    pruned_attention_blocks: Tuple[int, ...] = ()

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def padded_intermediate_size(self) -> int:
        if self.block_intermediate_sizes is None:
            return self.intermediate_size
        return max(self.block_intermediate_sizes)

    def logical_block_intermediate(self, i: int) -> int:
        if self.block_intermediate_sizes is None:
            return self.intermediate_size
        return self.block_intermediate_sizes[i]

    @property
    def attn_store_index(self) -> Tuple[Optional[int], ...]:
        """Map block index -> row in the stacked attention arrays (None = removed)."""
        idx = []
        j = 0
        for i in range(self.num_layers):
            if i in self.pruned_attention_blocks:
                idx.append(None)
            else:
                idx.append(j)
                j += 1
        return tuple(idx)

    @property
    def is_materialized_pruned(self) -> bool:
        return bool(self.pruned_attention_blocks) or self.block_intermediate_sizes is not None


def init_vit_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """Initialize dense ViT parameters (trunc-normal 0.02, zeros for biases)."""
    if cfg.is_materialized_pruned:
        raise ValueError("init_vit_params expects a dense (unpruned) config")
    d, f, n = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    patch_dim = cfg.num_channels * cfg.patch_size**2

    keys = iter(jax.random.split(rng, 16))

    def tn(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32) * std).astype(dtype)

    params: Params = {
        "patch_embed": {"kernel": tn(next(keys), (patch_dim, d)), "bias": jnp.zeros((d,), dtype)},
        "cls_token": tn(next(keys), (1, 1, d)),
        "pos_embed": tn(next(keys), (1, cfg.seq_len, d)),
        "blocks": {
            "ln1_scale": jnp.ones((n, d), dtype),
            "ln1_bias": jnp.zeros((n, d), dtype),
            "qkv_kernel": tn(next(keys), (n, d, 3 * d)),
            "qkv_bias": jnp.zeros((n, 3 * d), dtype),
            "proj_kernel": tn(next(keys), (n, d, d)),
            "proj_bias": jnp.zeros((n, d), dtype),
            "ln2_scale": jnp.ones((n, d), dtype),
            "ln2_bias": jnp.zeros((n, d), dtype),
            "fc1_kernel": tn(next(keys), (n, d, f)),
            "fc1_bias": jnp.zeros((n, f), dtype),
            "fc2_kernel": tn(next(keys), (n, f, d)),
            "fc2_bias": jnp.zeros((n, d), dtype),
        },
        "ln_final_scale": jnp.ones((d,), dtype),
        "ln_final_bias": jnp.zeros((d,), dtype),
    }
    params["head"] = init_head_params(next(keys), cfg, dtype)
    return params


def init_head_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    d, c = cfg.hidden_size, cfg.num_classes

    def tn(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32) * std).astype(dtype)

    if cfg.head_type == "linear":
        return {"kernel": tn(rng, (d, c)), "bias": jnp.zeros((c,), dtype)}
    elif cfg.head_type == "adapter":
        if cfg.adapter_bottleneck <= 0:
            raise ValueError("adapter head requires adapter_bottleneck > 0")
        k0, k1 = jax.random.split(rng)
        m = cfg.adapter_bottleneck
        # Linear(d->m, no bias) -> GELU -> Linear(m->c, bias); mirrors the
        # reference adapter (src/vit_pruning.py:866-870).
        return {"w0": tn(k0, (d, m)), "w2": tn(k1, (m, c)), "b2": jnp.zeros((c,), dtype)}
    raise ValueError(f"unknown head_type {cfg.head_type}")


def apply_head(head: Params, cfg: ViTConfig, cls_repr: jax.Array) -> jax.Array:
    from ssp_x_vit_tpu.ops.common import mm_quant

    dt = cls_repr.dtype
    if cfg.head_type == "linear":
        return mm_quant(cls_repr, head, "kernel", dt) + head["bias"].astype(dt)
    h = gelu(mm_quant(cls_repr, head, "w0", dt))
    return mm_quant(h, head, "w2", dt) + head["b2"].astype(dt)


def embed(params: Params, cfg: ViTConfig, pixel_values: jax.Array, dtype) -> jax.Array:
    """pixel_values [batch, H, W, C] -> embedded tokens [batch, seq, hidden]."""
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    from ssp_x_vit_tpu.ops.common import mm_quant

    x = mm_quant(x, params["patch_embed"], "kernel", dtype) + \
        params["patch_embed"]["bias"].astype(dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (x.shape[0], 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["pos_embed"].astype(dtype)


def _block_apply_quantized(
    x, bp, cfg, *, attn_gate, mlp_gate, neuron_mask, collect_ffn_stats,
    skip_attention_statically=False,
):
    """int8/int4-weight block (models/quant.py pytrees): same math as the
    XLA branch with every projection routed through ops.common.mm_quant;
    the fused pallas kernels are bypassed (they take raw bf16 arrays)."""
    from ssp_x_vit_tpu.ops.attention import sdpa_reference
    from ssp_x_vit_tpu.ops.common import mm_quant

    dt = x.dtype
    if not skip_attention_statically:
        h = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"], cfg.layernorm_eps)
        qkv = mm_quant(h, bp, "qkv_kernel", dt)
        if bp.get("qkv_bias") is not None:
            qkv = qkv + bp["qkv_bias"].astype(dt)
        b, sq, _ = x.shape
        hd = cfg.hidden_size // cfg.num_heads
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(b, sq, cfg.num_heads, hd).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        attn = sdpa_reference(q, k, v).transpose(0, 2, 1, 3).reshape(b, sq, -1)
        attn = mm_quant(attn, bp, "proj_kernel", dt)
        if bp.get("proj_bias") is not None:
            attn = attn + bp["proj_bias"].astype(dt)
        if attn_gate is not None:
            attn = attn * attn_gate.astype(dt)
        x = x + attn

    h2 = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"], cfg.layernorm_eps)
    hm = mm_quant(h2, bp, "fc1_kernel", dt)
    if bp.get("fc1_bias") is not None:
        hm = hm + bp["fc1_bias"].astype(dt)
    hm = gelu(hm)
    stats = None
    if collect_ffn_stats:
        stats = jnp.sum(jnp.square(hm.astype(jnp.float32)), axis=1)
    if neuron_mask is not None:
        hm = hm * neuron_mask.astype(dt)
    mlp = mm_quant(hm, bp, "fc2_kernel", dt)
    if bp.get("fc2_bias") is not None:
        mlp = mlp + bp["fc2_bias"].astype(dt)
    if mlp_gate is not None:
        mlp = mlp * mlp_gate.astype(dt)
    return x + mlp, stats


def _block_apply(
    x: jax.Array,
    bp: Params,
    cfg: ViTConfig,
    *,
    attn_gate: Optional[jax.Array],
    mlp_gate: Optional[jax.Array],
    neuron_mask: Optional[jax.Array],
    collect_ffn_stats: bool,
    skip_attention_statically: bool = False,
    allow_fused_attn: bool = True,
):
    """One pre-LN encoder block; gates are scalars (or None = dense)."""
    if "fc1_kernel" not in bp:  # quantized pytree (models/quant.py)
        return _block_apply_quantized(
            x, bp, cfg, attn_gate=attn_gate, mlp_gate=mlp_gate,
            neuron_mask=neuron_mask, collect_ffn_stats=collect_ffn_stats,
            skip_attention_statically=skip_attention_statically)
    if not skip_attention_statically:
        from ssp_x_vit_tpu.ops.dispatch import use_fused_attn_block

        v2_capable = cfg.num_heads % 2 == 0
        if allow_fused_attn \
                and use_fused_attn_block(x.shape, cfg.num_heads,
                                         ffn_width=bp["fc1_kernel"].shape[-1],
                                         v2=v2_capable) \
                and bp.get("qkv_bias") is not None \
                and bp.get("proj_bias") is not None:
            from ssp_x_vit_tpu.ops.pallas.fused_attn_block import (
                fused_attn_block, fused_attn_block_v2,
            )

            # v2 (full-MXU combined projections) measured 1.33x over v1
            # end-to-end at ViT-B b=256 (79.1 vs 105.0 ms, bitwise-equal
            # logits — docs/tpu_notes.md); needs an even head count.
            kernel = fused_attn_block_v2 if v2_capable else fused_attn_block
            x = kernel(
                x, bp["ln1_scale"], bp["ln1_bias"], bp["qkv_kernel"],
                bp["qkv_bias"], bp["proj_kernel"], bp["proj_bias"],
                cfg.num_heads, eps=cfg.layernorm_eps,
                gate=1.0 if attn_gate is None else attn_gate)
        else:
            attn_out = multi_head_attention(
                layer_norm(x, bp["ln1_scale"], bp["ln1_bias"], cfg.layernorm_eps),
                bp["qkv_kernel"],
                bp.get("qkv_bias"),
                bp["proj_kernel"],
                bp.get("proj_bias"),
                cfg.num_heads,
            )
            if attn_gate is not None:
                attn_out = attn_out * attn_gate.astype(attn_out.dtype)
            x = x + attn_out

    from ssp_x_vit_tpu.ops.dispatch import use_pallas

    f_width = bp["fc1_kernel"].shape[-1]
    # Same measured crossover as ffn_forward's dispatch (f >= 2048); the block
    # variant additionally folds LN2 + gated residual into the kernel. The
    # vmapped candidate-search forward keeps the XLA path (allow_fused_attn
    # gates BOTH residual-branch fusions — SMEM scalar operands do not vmap
    # efficiently).
    if allow_fused_attn and use_pallas() and x.shape[1] >= 64 \
            and f_width >= 2048 and bp.get("fc1_bias") is not None \
            and bp.get("fc2_bias") is not None:
        from ssp_x_vit_tpu.ops.pallas.fused_ffn import fused_ffn_block

        x, stats = fused_ffn_block(
            x, bp["ln2_scale"], bp["ln2_bias"], bp["fc1_kernel"],
            bp["fc1_bias"], bp["fc2_kernel"], bp["fc2_bias"],
            neuron_mask=neuron_mask, collect_stats=collect_ffn_stats,
            eps=cfg.layernorm_eps,
            gate=1.0 if mlp_gate is None else mlp_gate)
        return x, stats

    mlp_out, stats = ffn_forward(
        layer_norm(x, bp["ln2_scale"], bp["ln2_bias"], cfg.layernorm_eps),
        bp["fc1_kernel"],
        bp.get("fc1_bias"),
        bp["fc2_kernel"],
        bp.get("fc2_bias"),
        neuron_mask=neuron_mask,
        collect_stats=collect_ffn_stats,
    )
    if mlp_gate is not None:
        mlp_out = mlp_out * mlp_gate.astype(mlp_out.dtype)
    x = x + mlp_out
    return x, stats


def vit_forward(
    params: Params,
    pixel_values: jax.Array,
    cfg: ViTConfig,
    *,
    attn_gate: Optional[jax.Array] = None,
    mlp_gate: Optional[jax.Array] = None,
    neuron_mask: Optional[jax.Array] = None,
    collect_ffn_stats: bool = False,
    return_block_outputs: bool = False,
    compute_dtype=jnp.float32,
    allow_fused_attn: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Masked (search-phase) forward over the stacked dense parameters.

    Args:
        attn_gate: [num_layers] float, 1.0 = attention active, 0.0 = skipped
            (residual passes through — exact semantics of the reference
            attention bypass, src/vit_pruning.py:416-429).
        mlp_gate: [num_layers] float, same for the FFN branch.
        neuron_mask: [num_layers, intermediate] float, per-neuron keep mask on
            the FFN intermediate activation.
        collect_ffn_stats: also return per-block, per-sample token-sumsq of the
            FFN intermediate activations: [num_layers, batch, intermediate].
        return_block_outputs: also return each block's output hidden states
            [num_layers, batch, seq, hidden] (shortGPT / window-based methods).

    Returns:
        (logits [batch, num_classes], aux dict with optional "ffn_stats",
         "block_outputs", and "cls_repr")
    """
    # Width-materialized models (padded stacked FFN arrays) still scan fine —
    # only depth-materialized models (attention arrays physically dropped)
    # need the unrolled forward.
    if cfg.pruned_attention_blocks:
        raise ValueError("use vit_forward_materialized for depth-materialized configs")

    x = embed(params, cfg, pixel_values, compute_dtype)
    n = cfg.num_layers

    blocks = params["blocks"]
    gates_a = attn_gate if attn_gate is not None else jnp.ones((n,), compute_dtype)
    gates_m = mlp_gate if mlp_gate is not None else jnp.ones((n,), compute_dtype)
    nmask = neuron_mask if neuron_mask is not None else jnp.ones((n, 1), compute_dtype)

    def body(x, scanned):
        bp, ga, gm, nm = scanned
        x, stats = _block_apply(
            x, bp, cfg,
            attn_gate=ga, mlp_gate=gm,
            neuron_mask=nm,
            collect_ffn_stats=collect_ffn_stats,
            allow_fused_attn=allow_fused_attn,
        )
        out = {}
        if collect_ffn_stats:
            out["ffn_stats"] = stats
        if return_block_outputs:
            out["block_outputs"] = x
        return x, out

    x, scanned_out = jax.lax.scan(body, x, (blocks, gates_a, gates_m, nmask))

    x = layer_norm(x, params["ln_final_scale"], params["ln_final_bias"], cfg.layernorm_eps)
    cls_repr = x[:, 0]
    logits = apply_head(params["head"], cfg, cls_repr)

    aux = dict(scanned_out)
    aux["cls_repr"] = cls_repr
    return logits, aux


def vit_forward_materialized(
    params: Params,
    pixel_values: jax.Array,
    cfg: ViTConfig,
    *,
    compute_dtype=jnp.float32,
    allow_fused_attn: bool = True,
) -> jax.Array:
    """Forward for a materialized-pruned model: unrolled, statically skips
    the attention of depth-pruned blocks and runs FFNs at the padded kept
    width. One XLA program per final architecture (cfg is static)."""
    x = embed(params, cfg, pixel_values, compute_dtype)
    blocks = params["blocks"]
    store = cfg.attn_store_index

    for i in range(cfg.num_layers):
        j = store[i]
        from ssp_x_vit_tpu.ops.common import pick_param_variants

        def _pick(bp, base, idx):
            bp.update(pick_param_variants(blocks, (base,), idx))

        bp = {
            "ln2_scale": blocks["ln2_scale"][i],
            "ln2_bias": blocks["ln2_bias"][i],
            "fc1_bias": blocks["fc1_bias"][i] if "fc1_bias" in blocks else None,
            "fc2_bias": blocks["fc2_bias"][i] if "fc2_bias" in blocks else None,
        }
        _pick(bp, "fc1_kernel", i)
        _pick(bp, "fc2_kernel", i)
        if j is not None:
            bp.update(
                ln1_scale=blocks["ln1_scale"][j],
                ln1_bias=blocks["ln1_bias"][j] ,
                qkv_bias=blocks["qkv_bias"][j] if "qkv_bias" in blocks else None,
                proj_bias=blocks["proj_bias"][j] if "proj_bias" in blocks else None,
            )
            _pick(bp, "qkv_kernel", j)
            _pick(bp, "proj_kernel", j)
        x, _ = _block_apply(
            x, bp, cfg,
            attn_gate=None, mlp_gate=None, neuron_mask=None,
            collect_ffn_stats=False,
            skip_attention_statically=(j is None),
            allow_fused_attn=allow_fused_attn,
        )

    x = layer_norm(x, params["ln_final_scale"], params["ln_final_bias"], cfg.layernorm_eps)
    return apply_head(params["head"], cfg, x[:, 0])
