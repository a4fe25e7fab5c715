"""Procgen corpus: determinism, contract, and learnability-proxy checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.data.procgen import (CLASS_NAMES, NUM_CLASSES,
                                        procgen_dataset, render_batch,
                                        sample_batch)


def test_dataset_contract_and_determinism():
    imgs, labels = procgen_dataset(64, image_size=32, seed=7)
    assert imgs.shape == (64, 32, 32, 3) and imgs.dtype == np.uint8
    assert labels.shape == (64,) and labels.dtype == np.int32
    assert int(imgs.max()) > 128  # not all-dark: renderer actually drew
    # class-balanced
    assert (np.bincount(labels, minlength=NUM_CLASSES) == 4).all()
    i2, l2 = procgen_dataset(64, image_size=32, seed=7)
    np.testing.assert_array_equal(imgs, i2)
    np.testing.assert_array_equal(labels, l2)
    i3, _ = procgen_dataset(64, image_size=32, seed=8)
    assert not np.array_equal(imgs, i3)


def test_render_batch_label_conditioning():
    # same keys, different labels -> different images (labels actually used)
    key = jax.random.PRNGKey(0)
    a = render_batch(key, jnp.zeros((8,), jnp.int32), image_size=32)
    b = render_batch(key, jnp.ones((8,), jnp.int32), image_size=32)
    assert float(jnp.abs(a - b).max()) > 0.05


def test_sample_batch_stream():
    imgs, labels = sample_batch(jax.random.PRNGKey(1), 32, image_size=32)
    assert imgs.shape == (32, 32, 32, 3)
    assert int(labels.min()) >= 0 and int(labels.max()) < NUM_CLASSES
    assert len(CLASS_NAMES) == NUM_CLASSES


def test_classes_linearly_separated_above_chance():
    """A ridge probe on raw pixels beats chance but stays far from perfect —
    the corpus carries label signal yet is not trivially linear. The
    rotation/position/color nuisances keep a linear pixel probe weak by
    design (measured 0.117 vs 0.0625 chance at this setup); full
    learnability is established by the trained ViT itself (1.0000 val top-1,
    ckpts/vit_procgen/train_meta.json)."""
    imgs, labels = procgen_dataset(512, image_size=32, seed=3)
    x = imgs.reshape(512, -1).astype(np.float32) / 255.0
    x = np.concatenate([x, np.ones((512, 1), np.float32)], 1)
    y = np.eye(NUM_CLASSES, dtype=np.float32)[labels]
    xtr, ytr, ltr = x[:384], y[:384], labels[:384]
    xte, lte = x[384:], labels[384:]
    w = np.linalg.solve(xtr.T @ xtr + 10.0 * np.eye(x.shape[1]), xtr.T @ ytr)
    acc = float((np.argmax(xte @ w, 1) == lte).mean())
    assert acc > 1.5 / NUM_CLASSES, f"probe acc {acc} ~ chance: corpus broken"
    assert acc < 0.95, f"probe acc {acc}: corpus trivially linear"
