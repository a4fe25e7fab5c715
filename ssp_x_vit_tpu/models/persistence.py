"""Pruned-model persistence: save/load (params, config) directories.

Covers the reference's checkpoint/resume surface (SURVEY.md §5.4):
``save_pretrained`` of pruned models into run-id dirs
(experiments/vit_pruning/auto_2ssp.py:741-762) and re-loading them without
recomputing importance. The config JSON round-trips the materialized-pruning
state (block_intermediate_sizes, pruned_attention_blocks), which the torch
reference cannot express and must re-derive via mask artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

from ssp_x_vit_tpu.models.checkpoints import load_params_npz, save_params_npz
from ssp_x_vit_tpu.models.vit import Params, ViTConfig


def save_pruned_model(out_dir: str, params: Params, cfg: ViTConfig) -> str:
    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(os.path.join(out_dir, "model.npz"), params)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    return out_dir


def load_pruned_model(model_dir: str, dtype=None) -> Tuple[Params, ViTConfig]:
    with open(os.path.join(model_dir, "config.json")) as f:
        d = json.load(f)
    # json turns tuples into lists; restore the hashable/static config form
    if d.get("block_intermediate_sizes") is not None:
        d["block_intermediate_sizes"] = tuple(d["block_intermediate_sizes"])
    d["pruned_attention_blocks"] = tuple(d.get("pruned_attention_blocks", ()))
    cfg = ViTConfig(**d)
    import jax.numpy as jnp

    params = load_params_npz(os.path.join(model_dir, "model.npz"),
                             dtype=dtype or jnp.float32)
    return params, cfg
