"""Invariants on the COMMITTED trained ViT checkpoint (VERDICT r4 #4/#5).

ckpts/vit_procgen: a 7.97M ViT trained in-repo on the procedural corpus
(scripts/train_vit_procgen.py, seed 0 — 1.0000 val top-1 at training time,
pinned in train_meta.json). The corpus is the seed, so the held-out set
regenerates exactly; these tests measure real trained weights on every CI
run. Accuracy tables: docs/trained_vit_bench.json.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "ckpts", "vit_procgen")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(CKPT, "train_meta.json")),
    reason="committed trained ViT checkpoint not present")


@pytest.fixture(scope="module")
def trained_vit():
    from ssp_x_vit_tpu.data.pipeline import DataPipeline
    from ssp_x_vit_tpu.data.procgen import procgen_dataset
    from ssp_x_vit_tpu.models.persistence import load_pruned_model

    params, cfg = load_pruned_model(CKPT, dtype=jnp.float32)
    # same held-out seed domain as train/bench scripts, small slice for CI
    imgs, labels = procgen_dataset(256, image_size=cfg.image_size,
                                   seed=10_000_019)
    test = list(DataPipeline(imgs, labels, img_size=cfg.image_size,
                             batch_size=128).batches())
    return params, cfg, test


def test_trained_vit_dense_top1(trained_vit):
    """Dense top-1 on regenerated held-out data reproduces the pinned
    training-time accuracy (1.0; allow a small slice tolerance)."""
    from ssp_x_vit_tpu.evaluation.classify import evaluate_top1

    params, cfg, test = trained_vit
    acc = evaluate_top1(params, cfg, test)
    with open(os.path.join(CKPT, "train_meta.json")) as f:
        pinned = json.load(f)["val_top1"]
    assert acc >= pinned - 0.02, (acc, pinned)


def test_trained_vit_prune_graceful(trained_vit):
    """25% 2SSP pruning on real trained weights costs little accuracy (the
    measured curve: 0.996 at 20%, 0.978 at 30%) — pinned loosely so CI
    catches importance-scoring regressions, not noise."""
    from ssp_x_vit_tpu.data.pipeline import DataPipeline
    from ssp_x_vit_tpu.data.procgen import procgen_dataset
    from ssp_x_vit_tpu.evaluation.classify import evaluate_top1
    from ssp_x_vit_tpu.pruning import two_ssp_prune_vit

    params, cfg, test = trained_vit
    cal_imgs, cal_labels = procgen_dataset(64, image_size=cfg.image_size,
                                           seed=77)
    calib = list(DataPipeline(cal_imgs, cal_labels, img_size=cfg.image_size,
                              batch_size=32).batches())
    p2, c2, _ = two_ssp_prune_vit(params, cfg, 0.25,
                                  calibration_batches=calib,
                                  eval_batches=test, importance_mode="copy",
                                  batch_limit=2, min_remaining=32)
    acc = evaluate_top1(p2, c2, test)
    assert acc >= 0.9, acc


def test_trained_vit_int8_top1(trained_vit):
    """int8 weight-only quantization is accuracy-free on trained weights
    (measured 1.0 == dense)."""
    from ssp_x_vit_tpu.evaluation.classify import evaluate_top1
    from ssp_x_vit_tpu.models.quant import quantize_vit_params_int8

    params, cfg, test = trained_vit
    q8 = quantize_vit_params_int8(params, cfg)
    acc = evaluate_top1(q8, cfg, test)
    assert acc >= 0.97, acc
