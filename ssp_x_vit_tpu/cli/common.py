"""Shared CLI helpers: model/dataset resolution for offline-capable drivers."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.models.vit import Params, ViTConfig, init_vit_params

# Named architectures (AugReg family used by the reference SRP stack).
NAMED_CONFIGS = {
    "vit-b16": dict(hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072),
    "vit-s16": dict(hidden_size=384, num_layers=12, num_heads=6, intermediate_size=1536),
    "vit-ti16": dict(hidden_size=192, num_layers=12, num_heads=3, intermediate_size=768),
    "google/vit-base-patch16-224": dict(hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072),
    # tiny test config (offline smoke / CI)
    "tiny": dict(image_size=32, patch_size=8, hidden_size=64, num_layers=4,
                 num_heads=4, intermediate_size=128),
}


def resolve_model(
    model: str,
    *,
    num_classes: int = 10,
    checkpoint: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.float32,
) -> Tuple[Params, ViTConfig]:
    """Resolve --model into (params, cfg).

    Accepts: a local HF model directory (config.json + weights), a named
    architecture from NAMED_CONFIGS (random init unless --checkpoint), or an
    AugReg ``.npz`` checkpoint path via ``checkpoint``.
    """
    from ssp_x_vit_tpu.models import checkpoints as ckpt

    if os.path.isdir(model):
        if os.path.exists(os.path.join(model, "model.npz")):
            from ssp_x_vit_tpu.models.persistence import load_pruned_model

            params, cfg = load_pruned_model(model, dtype=dtype)
            print(f"[INFO] Loaded framework (possibly pruned) model: {model}")
            return params, cfg
        params, cfg = ckpt.load_hf_vit(model, num_classes=num_classes, dtype=dtype)
        print(f"[INFO] Loaded HF model from directory: {model}")
        return params, cfg

    key = model.lower()
    if key not in NAMED_CONFIGS:
        print(f"[WARN] '{model}' is not a local directory or known architecture; "
              f"known: {sorted(NAMED_CONFIGS)}. Using vit-b16 architecture.")
        key = "vit-b16"
    cfg = ViTConfig(num_classes=num_classes, **NAMED_CONFIGS[key])

    if checkpoint:
        if checkpoint.endswith(".npz"):
            try:
                params = ckpt.load_params_npz(checkpoint, dtype=dtype)
                print(f"[INFO] Loaded framework npz checkpoint: {checkpoint}")
                return params, cfg
            except Exception:
                params = ckpt.load_augreg_npz(checkpoint, cfg, dtype=dtype)
                print(f"[INFO] Loaded AugReg npz checkpoint: {checkpoint}")
                return params, cfg
        sd = ckpt.load_state_dict_file(checkpoint)
        params = ckpt.params_from_hf_state_dict(sd, cfg, dtype=dtype)
        print(f"[INFO] Loaded state dict: {checkpoint}")
        return params, cfg

    print(f"[INFO] No checkpoint available; initializing {key} randomly "
          f"(offline mode — metrics are pipeline-valid, accuracy is chance)")
    return init_vit_params(jax.random.PRNGKey(seed), cfg, dtype=dtype), cfg


def resolve_dataset(
    dataset: str,
    cfg: ViTConfig,
    *,
    train_pct: float = 0.25,
    test_pct: float = 0.25,
    calib_per_class: int = 2,
    seed: int = 0,
):
    """--dataset cifar10|cifar100|synthetic -> (train, test, calib) pipelines."""
    from ssp_x_vit_tpu.data.pipeline import DataPipeline, load_cifar, synthetic_dataset

    ds = dataset.lower()
    if ds in ("cifar10", "cifar100"):
        return load_cifar(
            ds, train_pct=train_pct, test_pct=test_pct,
            calib_per_class=calib_per_class, img_size=cfg.image_size, seed=seed,
        )
    if ds == "synthetic":
        n_cls = cfg.num_classes
        tr_x, tr_y = synthetic_dataset(1024, n_cls, image_size=cfg.image_size, seed=seed)
        te_x, te_y = synthetic_dataset(512, n_cls, image_size=cfg.image_size, seed=seed + 1)
        train = DataPipeline(tr_x, tr_y, img_size=cfg.image_size, batch_size=32, shuffle=True, seed=seed)
        test = DataPipeline(te_x, te_y, img_size=cfg.image_size, batch_size=64)
        calib = DataPipeline(tr_x[: calib_per_class * n_cls], tr_y[: calib_per_class * n_cls],
                             img_size=cfg.image_size, batch_size=64)
        return train, test, calib
    raise ValueError(f"unknown dataset {dataset}")
