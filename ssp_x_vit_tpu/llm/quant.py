"""Weight-only int8 quantization for the LLM serving path.

Decode is HBM-bandwidth-bound (one token's activations vs every weight
matrix per step), so halving weight bytes is worth up to 2x decode
throughput on TPU. TPU-native recipe:

- symmetric per-output-channel int8: ``w ~= w_q * scale[out]`` with
  ``scale = max|w[:, out]| / 127`` (zero-point-free keeps the matmul a pure
  dot; per-OUTPUT-channel scales commute with the contraction),
- the scale is applied to the matmul OUTPUT, never to the weight:
  ``(x @ w_q.astype(bf16)) * scale``. The only weight-side op is the
  int8->bf16 convert, which XLA fuses into the dot's operand load (no
  dequantized copy of the weight ever exists in HBM), and the per-channel
  multiply fuses into the dot's epilogue.
- norms, biases, embeddings stay bf16/f32 (they are O(d), not O(d^2));
  the embedding gather reads only the looked-up rows so quantizing it
  saves nothing per step. A TIED lm_head (``embed.T``) therefore also
  stays unquantized; an untied ``lm_head`` is quantized.

The quantized pytree keeps the stacked-[L, ...] layout, so the serving
path's ``lax.scan`` over layers, the speculative-decoding loop and the
paged continuous-batching engine all work unchanged — ``serve._mm``
dispatches on the presence of ``<name>_q``.

The reference framework has no quantized inference (pruning is its only
compression axis); this composes with it: a 2SSP-pruned model quantizes
the same way (materialized arrays are plain stacked pytrees).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params

# 2-D projection kernels worth quantizing: [.., d_in, d_out] with the scale
# over the LAST axis. Biases/norms are skipped; per-key presence is optional
# (llama layout has gate/up/down, phi layout fc1/fc2 + biases).
QUANT_KEYS = ("q_kernel", "k_kernel", "v_kernel", "o_kernel",
              "gate_kernel", "up_kernel", "down_kernel",
              "fc1_kernel", "fc2_kernel",
              # serve.pack_llm_params_for_serving fused names — quantizing
              # an already-packed pytree must hit the projections too
              "qkv_kernel", "gateup_kernel")


def quantize_weight_int8(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8. ``w`` [..., d_in, d_out] (leading
    stacked-layer axes fine); returns (w_q int8 same shape, scale f32 with
    the d_in axis reduced away)."""
    w = jnp.asarray(w)
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_q = jnp.round(w.astype(jnp.float32) / scale[..., None, :])
    return jnp.clip(w_q, -127, 127).astype(jnp.int8), scale


def dequantize_weight(w_q, scale, dtype=jnp.float32):
    return (w_q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def quantize_llm_params_int8(params: Params, cfg: LlamaConfig) -> Params:
    """Return a serving pytree where every projection kernel ``k`` is
    replaced by ``k + "_q"`` (int8) and ``k + "_scale"`` (f32 per-out-channel).
    Original bf16 kernels are dropped (that's the point: no double storage).
    Works on dense, width-pruned, depth-materialized AND MoE stacked
    pytrees (expert kernels [L, E, d_in, d_out] quantize per-(expert,
    out-channel); the router stays float — it is tiny and argmax-critical).
    """
    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = {}
    for k, v in params["blocks"].items():
        if k in QUANT_KEYS:
            w_q, scale = quantize_weight_int8(v)
            blocks[k + "_q"] = w_q
            blocks[k + "_scale"] = scale
        else:
            blocks[k] = v
    out["blocks"] = blocks
    if "lm_head" in out:  # untied head only; tied embed.T stays bf16
        w_q, scale = quantize_weight_int8(out.pop("lm_head"))
        out["lm_head_q"], out["lm_head_scale"] = w_q, scale
    return out


# DeepSeek/MLA projection kernels (llm/deepseek.py): the low-rank a/b
# projections, the absorbed kv_b, o, dense-FFN and shared-expert GLUs, and
# the expert-stacked routed kernels ([L, E, d_in, d_out] quantize
# per-(expert, out-channel)). router/e_bias stay float (tiny,
# selection-critical); norms stay float.
DS_QUANT_KEYS = ("q_kernel", "q_a_kernel", "q_b_kernel", "kv_a_kernel",
                 "kv_b_kernel", "o_kernel", "gate_kernel", "up_kernel",
                 "down_kernel", "shared_gate", "shared_up", "shared_down")


def quantize_deepseek_params_int8(params: Params, cfg) -> Params:
    """int8 weights for the DeepSeek/MLA family: every projection kernel in
    ``dense_blocks``/``moe_blocks`` becomes ``k+"_q"`` (int8) +
    ``k+"_scale"`` (f32 per-out-channel), consumed by deepseek._mm /
    _kv_b_matrix / the expert-einsum epilogues. The absorbed-decode
    exactness argument is unchanged — both the full forward and the
    absorbed paths consume the same dequantized weights."""
    out = {k: v for k, v in params.items()
           if k not in ("dense_blocks", "moe_blocks")}
    for grp in ("dense_blocks", "moe_blocks"):
        if grp not in params:
            continue
        blocks = {}
        for k, v in params[grp].items():
            if k in DS_QUANT_KEYS:
                w_q, scale = quantize_weight_int8(v)
                blocks[k + "_q"], blocks[k + "_scale"] = w_q, scale
            else:
                blocks[k] = v
        out[grp] = blocks
    if "lm_head" in out:  # untied head only; tied embed.T stays float
        w_q, scale = quantize_weight_int8(out.pop("lm_head"))
        out["lm_head_q"], out["lm_head_scale"] = w_q, scale
    return out


def quantize_deepseek_params_int4(params: Params, cfg) -> Params:
    """int4 weights for the DeepSeek/MLA family: 2-D projection kernels
    (stacked [L, K, N] in ``dense_blocks``/``moe_blocks``) become
    ``k+"_q4"`` packed nibbles + ``k+"_scale"``, consumed by deepseek._mm
    (pallas quant4 kernel) and _kv_b_matrix (host-free unpack, the absorbed
    decode folds the dequantized matrix through per-head einsums).

    Routed expert stacks ([L, E, K, N], ndim==4) pack int4 per-(layer,
    expert, out-channel): _deepseek_moe's expert einsum unpacks the nibble
    stack in-graph (ops/pallas/quant_matmul.unpack_int4 over axis -2) and
    folds the [E, N] scales into the per-expert epilogue — the routed
    experts are ~90% of a V3-geometry MoE's weights, so they carry the
    int4 footprint win (VERDICT r3 #7; previously they silently stayed
    int8). lm_head stays int8 (same accuracy/size tradeoff as the llama
    family); router/e_bias/norms stay float."""
    from ssp_x_vit_tpu.ops.pallas.quant_matmul import quantize_weight_int4

    out = {k: v for k, v in params.items()
           if k not in ("dense_blocks", "moe_blocks")}
    for grp in ("dense_blocks", "moe_blocks"):
        if grp not in params:
            continue
        blocks = {}
        for k, v in params[grp].items():
            if k not in DS_QUANT_KEYS:
                blocks[k] = v
            else:              # stacked projections + expert stacks -> int4
                w_p, scale = quantize_weight_int4(v)
                blocks[k + "_q4"], blocks[k + "_scale"] = w_p, scale
        out[grp] = blocks
    if "lm_head" in out:  # untied head only; tied embed.T stays float
        w_q, scale = quantize_weight_int8(out.pop("lm_head"))
        out["lm_head_q"], out["lm_head_scale"] = w_q, scale
    return out


def quantize_llm_params_int4(params: Params, cfg: LlamaConfig) -> Params:
    """int4 variant: projection kernels become ``k + "_q4"`` (packed
    [K/2, N] int8 nibbles, ops/pallas/quant_matmul.pack_int4 layout) +
    ``k + "_scale"``. Serving dispatches to the pallas quant4 kernel
    (serve._mm) — XLA cannot fuse through the nibble packing. MoE expert
    stacks ([L, E, K, N], ndim==4) pack int4 per-(layer, expert,
    out-channel); moe_ffn_dropless unpacks the nibble stack in-graph for
    its expert einsum (parallel/moe.py). lm_head stays int8: the 15-level
    absmax grid is coarse, and keeping the head at int8 is the standard
    accuracy/size tradeoff (head bytes are a small fraction of the
    stream)."""
    from ssp_x_vit_tpu.ops.pallas.quant_matmul import quantize_weight_int4

    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = {}
    for k, v in params["blocks"].items():
        if k in QUANT_KEYS:
            w_p, scale = quantize_weight_int4(v)
            blocks[k + "_q4"] = w_p
            blocks[k + "_scale"] = scale
        else:
            blocks[k] = v
    out["blocks"] = blocks
    if "lm_head" in out:
        w_q, scale = quantize_weight_int8(out.pop("lm_head"))
        out["lm_head_q"], out["lm_head_scale"] = w_q, scale
    return out


def quantized_param_bytes(params: Params) -> int:
    """Actual serving-weight footprint in bytes (int8 + scales + the rest)."""
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
