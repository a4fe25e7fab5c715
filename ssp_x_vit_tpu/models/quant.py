"""Weight-only int8 quantization for the ViT path.

The reference's headline latency protocol is BATCH-1 forward
(experiments/vit_pruning/auto_2ssp.py:74-99, reports/report-2perc.md:21) —
exactly the regime where ViT-B/16 is weight-bound (~172 MB bf16 streamed per
image). int8 halves the stream; same epilogue-scale recipe as llm/quant.py
(per-output-channel scales, convert fused into the dot by XLA), dispatched
by ops.common.mm_quant inside models/vit.py.

Composes with 2SSP: a width/depth-materialized pruned ViT quantizes the
same way, stacking the two compressions (params AND bytes-per-param).
"""

from __future__ import annotations

from ssp_x_vit_tpu.llm.quant import quantize_weight_int8
from ssp_x_vit_tpu.models.vit import Params, ViTConfig

# Stacked [L, K, N] projection kernels in blocks.
_VIT_BLOCK_KEYS = ("qkv_kernel", "proj_kernel", "fc1_kernel", "fc2_kernel")
# 2-D [K, N] kernels elsewhere: (container key, kernel name)
_VIT_FLAT_KEYS = (("patch_embed", "kernel"), ("head", "kernel"),
                  ("head", "w0"), ("head", "w2"))


def quantize_vit_params_int8(params: Params, cfg: ViTConfig) -> Params:
    """Serving pytree with every projection kernel replaced by
    ``<k>_q`` int8 + ``<k>_scale`` f32 (per-out-channel). Norms, biases,
    cls/pos embeddings stay as-is. Works on dense and materialized-pruned
    stacked pytrees (zero-padded pruned widths quantize harmlessly: padded
    columns get scale 1.0 and all-zero codes)."""
    out = {}
    for k, v in params.items():
        if k == "blocks":
            blocks = {}
            for bk, bv in v.items():
                if bk in _VIT_BLOCK_KEYS:
                    w_q, scale = quantize_weight_int8(bv)
                    blocks[bk + "_q"] = w_q
                    blocks[bk + "_scale"] = scale
                else:
                    blocks[bk] = bv
            out["blocks"] = blocks
        elif isinstance(v, dict):
            sub = dict(v)
            for ck, kk in _VIT_FLAT_KEYS:
                if ck == k and kk in sub:
                    w_q, scale = quantize_weight_int8(sub.pop(kk))
                    sub[kk + "_q"] = w_q
                    sub[kk + "_scale"] = scale
            out[k] = sub
        else:
            out[k] = v
    return out
