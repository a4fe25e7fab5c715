"""Tensor-parallel sharding rules for the ViT (GSPMD over the mesh).

Not required at 86M params (SURVEY.md §2.7 notes TP is optional for the ViT),
but provided so large-ViT/scaled runs shard the same way as the LLM path:
column-parallel fused-QKV/fc1, row-parallel proj/fc2, batch DP for pixels.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssp_x_vit_tpu.models.vit import Params, ViTConfig


def vit_param_specs(cfg: ViTConfig) -> Dict[str, Any]:
    blocks = {
        "ln1_scale": P(None, None), "ln1_bias": P(None, None),
        "qkv_kernel": P(None, None, "model"),
        "qkv_bias": P(None, "model"),
        "proj_kernel": P(None, "model", None),  # row-parallel -> psum
        "proj_bias": P(None, None),
        "ln2_scale": P(None, None), "ln2_bias": P(None, None),
        "fc1_kernel": P(None, None, "model"),
        "fc1_bias": P(None, "model"),
        "fc2_kernel": P(None, "model", None),
        "fc2_bias": P(None, None),
    }
    head = ({"kernel": P(None, None), "bias": P(None)}
            if cfg.head_type == "linear"
            else {"w0": P(None, None), "w2": P(None, None), "b2": P(None)})
    return {
        "patch_embed": {"kernel": P(None, None), "bias": P(None)},
        "cls_token": P(None, None, None),
        "pos_embed": P(None, None, None),
        "blocks": blocks,
        "ln_final_scale": P(None), "ln_final_bias": P(None),
        "head": head,
    }


def shard_vit_params(params: Params, mesh: Mesh, cfg: ViTConfig) -> Params:
    specs = vit_param_specs(cfg)

    def place(spec, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, specs, params, is_leaf=lambda x: isinstance(x, P))
