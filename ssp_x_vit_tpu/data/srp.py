"""SRP checkpoint provisioning + dataset loaders
(reference pruning_srp-main/process_models.py:11-53, load_models.py:20-87,
process_datasets.py; legacy copies in experiments/vit_pruning/auto_2ssp.py:
305-504).

Checkpoint selection reproduces the index.csv logic exactly (csv parsing is
stdlib — no pandas dependency):
  1. among i21k pretrains, keep each architecture's best final_val filename;
  2. among finetunes of those pretrains, filter (name==model_type,
     adapt_ds==dataset) and sort by adapt_final_val ascending;
  3. take the ``top10_idx``-th from the end of that list.

Download chain (urllib -> curl -> unverified-SSL, reference
auto_2ssp.py:371-404) is attempted only when the environment has egress;
otherwise a local ``models_dir`` copy is required. Loaded ``.npz`` weights go
through models/checkpoints.params_from_augreg_npz — no timm, no weight
"transfer" step (the pytree IS the unified layout).
"""

from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np

TIMM_MODELNAMES = {
    "Ti/16-224": "vit_tiny_patch16_224",
    "Ti/16-384": "vit_tiny_patch16_384",
    "S/16-224": "vit_small_patch16_224",
    "S/16-384": "vit_small_patch16_384",
    "B/16-224": "vit_base_patch16_224",
    "B/16-384": "vit_base_patch16_384",
}

ARCH = {
    "Ti/16": dict(hidden_size=192, num_layers=12, num_heads=3, intermediate_size=768),
    "S/16": dict(hidden_size=384, num_layers=12, num_heads=6, intermediate_size=1536),
    "B/16": dict(hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072),
}


def select_srp_checkpoint(index_csv: str, model_type: str, dataset_name: str,
                          top10_idx: int = 1) -> str:
    """Pick the finetuned AugReg checkpoint filename from index.csv."""
    with open(index_csv, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))

    # best i21k pretrain per architecture name by final_val
    best_pretrain = {}
    for r in rows:
        if r.get("ds") != "i21k":
            continue
        name = r["name"]
        fv = float(r.get("final_val") or 0.0)
        if name not in best_pretrain or fv >= best_pretrain[name][0]:
            best_pretrain[name] = (fv, r["filename"])
    pretrains = {fn for _, fn in best_pretrain.values()}

    finetunes = [
        r for r in rows
        if r.get("filename") in pretrains
        and r.get("name") == model_type
        and r.get("adapt_ds") == dataset_name
    ]
    if not finetunes:
        raise ValueError(f"no finetunes for {model_type} on {dataset_name} in {index_csv}")
    finetunes.sort(key=lambda r: float(r.get("adapt_final_val") or 0.0))
    candidates = [r["adapt_filename"] for r in finetunes]
    if top10_idx < 1 or top10_idx > len(candidates):
        raise ValueError(f"top10_idx {top10_idx} out of range (1..{len(candidates)})")
    return candidates[-top10_idx]


def download_checkpoint(checkpoint: str, models_dir: str) -> str:
    """3-way fallback download (urllib -> curl -> unverified SSL),
    reference auto_2ssp.py:376-404. Zero-egress environments will fail all
    three with a clear error telling the user to provide the file locally."""
    os.makedirs(models_dir, exist_ok=True)
    dst = os.path.join(models_dir, f"{checkpoint}.npz")
    if os.path.exists(dst):
        return dst
    url = f"https://storage.googleapis.com/vit_models/augreg/{checkpoint}.npz"

    try:
        import urllib.request

        urllib.request.urlretrieve(url, dst)
        return dst
    except Exception as e1:
        err1 = e1
    try:
        import subprocess

        subprocess.run(["curl", "-fL", "-o", dst, url], check=True, timeout=600)
        return dst
    except Exception as e2:
        err2 = e2
    try:
        import ssl
        import urllib.request

        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        with urllib.request.urlopen(url, context=ctx) as r, open(dst, "wb") as f:
            f.write(r.read())
        return dst
    except Exception as e3:
        raise FileNotFoundError(
            f"Could not download {checkpoint}.npz (urllib: {err1}; curl: {err2}; "
            f"unverified-SSL: {e3}). Place the file at {dst} manually "
            f"(zero-egress environment?)")


def load_srp_model(
    model_type: str = "B/16",
    dataset_name: str = "cifar100",
    *,
    top10_idx: int = 1,
    index_csv: Optional[str] = None,
    models_dir: str = "models",
    checkpoint_npz: Optional[str] = None,
    num_classes: Optional[int] = None,
    verbose: bool = False,
):
    """(params, cfg) for the selected SRP AugReg checkpoint.

    ``checkpoint_npz`` bypasses index.csv selection (reference
    --srp-checkpoint-npz)."""

    from ssp_x_vit_tpu.models.checkpoints import load_augreg_npz
    from ssp_x_vit_tpu.models.vit import ViTConfig

    if num_classes is None:
        num_classes = 100 if dataset_name == "cifar100" else 37

    if checkpoint_npz is None:
        if index_csv is None:
            index_csv = os.path.join(models_dir, "index.csv")
        checkpoint = select_srp_checkpoint(index_csv, model_type, dataset_name, top10_idx)
        if verbose:
            print(f"Loaded checkpoint: {checkpoint}")
        res = int(checkpoint.split("_")[-1])
        checkpoint_npz = download_checkpoint(checkpoint, models_dir)
    else:
        res = 224

    cfg = ViTConfig(image_size=res, patch_size=16, num_classes=num_classes,
                    **ARCH[model_type])
    params = load_augreg_npz(checkpoint_npz, cfg)
    return params, cfg


def load_srp_dataset(
    dataset: str = "cifar100",
    *,
    batch_size: int = 64,
    subset_size: float = 1.0,
    res: int = 224,
    split: str = "test",  # "trainval" | "test"
    root: Optional[str] = None,
    seed: int = 42,
):
    """SRP dataset loaders (reference process_datasets.py): CIFAR-100 or
    Oxford-IIIT-Pet, 0.5-normalized, resized; trainval gets a seeded 90/10
    split. Returns DataPipeline(s); synthetic fallback offline."""
    from ssp_x_vit_tpu.data.pipeline import DataPipeline, synthetic_dataset, _load_cifar_arrays

    num_classes = 100 if dataset == "cifar100" else 37
    train = split == "trainval"

    images = labels = None
    if dataset == "cifar100":
        arrays = _load_cifar_arrays("cifar100", root)
        if arrays is not None:
            tr_x, tr_y, te_x, te_y = arrays
            images, labels = (tr_x, tr_y) if train else (te_x, te_y)
    else:
        try:
            from torchvision.datasets import OxfordIIITPet

            ds = OxfordIIITPet(root or "data/", split="trainval" if train else "test",
                               download=False)
            images = np.stack([np.asarray(img.convert("RGB").resize((res, res)))
                               for img, _ in ds])
            labels = np.asarray([y for _, y in ds], np.int32)
        except Exception:
            pass

    if images is None:
        print(f"[INFO] {dataset} not on disk; using deterministic synthetic stand-in")
        images, labels = synthetic_dataset(1024 if train else 512, num_classes, seed=seed)

    rng = np.random.default_rng(seed)
    n = len(images)
    order = rng.permutation(n)
    if subset_size < 1.0:
        order = order[: int(n * subset_size)]
    images, labels = images[order], labels[order]

    if train:
        n_train = int(len(images) * 0.9)
        return (
            DataPipeline(images[:n_train], labels[:n_train], img_size=res,
                         batch_size=batch_size, shuffle=True, seed=seed),
            DataPipeline(images[n_train:], labels[n_train:], img_size=res,
                         batch_size=batch_size),
        )
    return DataPipeline(images, labels, img_size=res, batch_size=batch_size)
