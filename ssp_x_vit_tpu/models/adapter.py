"""Classifier / adapter head artifacts
(reference src/vit_pruning.py:776-875 save_cifar_adapter / load_cifar_adapter).

Framework-native format: ``adapter.npz`` (head arrays) + ``adapter.json``
(metadata). For drop-in compatibility with reference artifacts, torch
``adapter.pt`` payloads are also readable (torch is cpu-available).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.models.vit import Params, ViTConfig


def save_cifar_adapter(params: Params, cfg: ViTConfig, out_dir: str,
                       filename: str = "adapter.npz",
                       extra: Optional[Dict[str, Any]] = None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, filename)
    head = {k: np.asarray(v) for k, v in params["head"].items()}
    np.savez(path, **head)
    meta = {
        "classifier_type": "Linear" if cfg.head_type == "linear" else "Sequential",
        "num_labels": cfg.num_classes,
        "hidden_size": cfg.hidden_size,
        "adapter_bottleneck": cfg.adapter_bottleneck,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "extra": extra or {},
    }
    with open(path + ".json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    return path


def load_cifar_adapter(path: str, params: Params, cfg: ViTConfig) -> Tuple[Params, ViTConfig]:
    """Load a saved head into (params, cfg); infers shape/type from the file.

    Accepts framework ``adapter.npz`` or a reference torch ``adapter.pt``.
    """
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        payload = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: v.float().numpy() for k, v in payload.get("state_dict", {}).items()}
        if "weight" in sd:  # torch Linear [out, in]
            head = {"kernel": jnp.asarray(sd["weight"].T), "bias": jnp.asarray(sd["bias"])}
            new_cfg = dataclasses.replace(cfg, head_type="linear", num_classes=sd["weight"].shape[0])
        elif "0.weight" in sd and "2.weight" in sd:  # Sequential(Linear,GELU,Linear)
            head = {
                "w0": jnp.asarray(sd["0.weight"].T),
                "w2": jnp.asarray(sd["2.weight"].T),
                "b2": jnp.asarray(sd["2.bias"]),
            }
            new_cfg = dataclasses.replace(
                cfg, head_type="adapter",
                adapter_bottleneck=sd["0.weight"].shape[0],
                num_classes=sd["2.weight"].shape[0],
            )
        else:
            raise RuntimeError("Cannot reconstruct adapter architecture from torch payload.")
    else:
        with np.load(path) as npz:
            head = {k: jnp.asarray(npz[k]) for k in npz.files}
        if "kernel" in head:
            new_cfg = dataclasses.replace(cfg, head_type="linear",
                                          num_classes=int(head["kernel"].shape[1]))
        elif "w0" in head:
            new_cfg = dataclasses.replace(
                cfg, head_type="adapter",
                adapter_bottleneck=int(head["w0"].shape[1]),
                num_classes=int(head["w2"].shape[1]),
            )
        else:
            raise RuntimeError(f"Unrecognized adapter file contents: {sorted(head)}")

    new_params = dict(params)
    new_params["head"] = head
    return new_params, new_cfg
