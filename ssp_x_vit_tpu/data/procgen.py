"""Procedurally generated offline image-classification corpus.

Zero-egress stand-in for a real vision dataset (the reference's ViT reports
are CIFAR-10 on a pretrained ViT-B/16, experiments/vit_pruning/reports/
report-*perc.md — both the dataset and the checkpoint are egress-blocked
here). The vision analogue of scripts/prepare_code_corpus.py: a fully
deterministic, seeded generator whose classes require COMBINING two visual
factors, so a trained ViT learns non-trivial features and pruning causes a
measurable, graded accuracy cost (the trained-ViT top-1-vs-sparsity tables
in docs/trained_bench.json are measured on this corpus).

Classes (16): shape {circle, square, triangle, cross} x texture
{solid, stripes, checker, dots}; label = shape_id * 4 + texture_id.
Nuisance factors randomized per sample: position, scale, rotation,
foreground/secondary/background colors, texture frequency + phase, pixel
noise — so neither factor is decodable from a single pixel statistic.

The renderer is pure jnp (vmap over samples, jit-able): sample generation
can run ON the TPU during training (zero host->device image traffic), and
the same code on the CPU backend yields the byte-identical dataset for
calibration/eval (fixed seeds). ``procgen_dataset`` mirrors
``synthetic_dataset``'s (images, labels) contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_SHAPES = 4
NUM_TEXTURES = 4
NUM_CLASSES = NUM_SHAPES * NUM_TEXTURES

CLASS_NAMES = tuple(
    f"{s}_{t}"
    for s in ("circle", "square", "triangle", "cross")
    for t in ("solid", "stripes", "checker", "dots")
)


def _render_one(key: jax.Array, label: jax.Array, image_size: int) -> jax.Array:
    """One [H, W, 3] float32 image in [0, 1] for `label`, deterministic in key."""
    shape_id = label // NUM_TEXTURES
    tex_id = label % NUM_TEXTURES
    ks = jax.random.split(key, 12)

    # nuisance parameters
    theta = jax.random.uniform(ks[0], (), minval=0.0, maxval=2.0 * jnp.pi)
    scale = jax.random.uniform(ks[1], (), minval=0.40, maxval=0.70)
    cx = jax.random.uniform(ks[2], (), minval=-0.18, maxval=0.18)
    cy = jax.random.uniform(ks[3], (), minval=-0.18, maxval=0.18)
    freq = jax.random.uniform(ks[4], (), minval=3.0, maxval=6.0)
    phase = jax.random.uniform(ks[5], (), minval=0.0, maxval=2.0 * jnp.pi)
    # colors: bright foreground pair with guaranteed separation from a dim bg
    fg = jax.random.uniform(ks[6], (3,), minval=0.55, maxval=1.0)
    fg2 = jax.random.uniform(ks[7], (3,), minval=0.0, maxval=0.35)
    bg = jax.random.uniform(ks[8], (3,), minval=0.25, maxval=0.50)
    noise = 0.04 * jax.random.normal(ks[9], (image_size, image_size, 3))

    # object-frame coordinates (rotate, translate, scale)
    ax = jnp.linspace(-1.0, 1.0, image_size)
    yy, xx = jnp.meshgrid(ax, ax, indexing="ij")
    c, s = jnp.cos(theta), jnp.sin(theta)
    u = ((xx - cx) * c + (yy - cy) * s) / scale
    v = (-(xx - cx) * s + (yy - cy) * c) / scale

    # signed distances (negative inside), one per shape, select by label
    r = jnp.sqrt(u * u + v * v + 1e-9)
    d_circle = r - 1.0
    d_square = jnp.maximum(jnp.abs(u), jnp.abs(v)) - 0.9
    # equilateral-ish triangle: three half-plane constraints
    d_triangle = jnp.maximum(0.55 * jnp.abs(u) * 2.0 - (0.8 - v), v - 0.8) - 0.0
    d_triangle = jnp.maximum(d_triangle, -0.9 - v)
    d_cross = jnp.minimum(
        jnp.maximum(jnp.abs(u) - 0.32, jnp.abs(v) - 1.0),
        jnp.maximum(jnp.abs(v) - 0.32, jnp.abs(u) - 1.0),
    )
    sdf = jnp.select(
        [shape_id == 0, shape_id == 1, shape_id == 2],
        [d_circle, d_square, d_triangle],
        d_cross,
    )
    # anti-aliased interior mask (smooth over ~1.5 px)
    aa = 1.5 * 2.0 / image_size / scale
    inside = jnp.clip(0.5 - sdf / aa, 0.0, 1.0)

    # texture pattern in the object frame: 1 -> fg, 0 -> fg2
    stripes = 0.5 + 0.5 * jnp.tanh(4.0 * jnp.sin(freq * jnp.pi * u + phase))
    checker = 0.5 + 0.5 * jnp.tanh(
        4.0 * jnp.sin(freq * jnp.pi * u + phase) * jnp.sin(freq * jnp.pi * v + phase)
    )
    dots = jnp.clip(
        0.5
        - 8.0
        * (jnp.sin(freq * jnp.pi * u + phase) ** 2 + jnp.sin(freq * jnp.pi * v + phase) ** 2 - 1.55),
        0.0,
        1.0,
    )
    tex = jnp.select(
        [tex_id == 0, tex_id == 1, tex_id == 2],
        [jnp.ones_like(u), stripes, checker],
        dots,
    )

    obj = tex[..., None] * fg + (1.0 - tex[..., None]) * fg2
    img = inside[..., None] * obj + (1.0 - inside[..., None]) * bg
    return jnp.clip(img + noise, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("image_size",))
def render_batch(key: jax.Array, labels: jax.Array, image_size: int = 64) -> jax.Array:
    """[N] labels -> [N, H, W, 3] float32 images; vmapped jnp, runs on any backend."""
    keys = jax.random.split(key, labels.shape[0])
    return jax.vmap(lambda k, l: _render_one(k, l, image_size))(keys, labels)


@functools.partial(jax.jit, static_argnames=("batch", "image_size", "num_classes"))
def sample_batch(key: jax.Array, batch: int, image_size: int = 64,
                 num_classes: int = NUM_CLASSES):
    """Random (images, labels) batch — the training stream. Deterministic in key."""
    kl, ki = jax.random.split(key)
    labels = jax.random.randint(kl, (batch,), 0, num_classes)
    return render_batch(ki, labels, image_size=image_size), labels


def procgen_dataset(n: int, image_size: int = 64, seed: int = 0,
                    num_classes: int = NUM_CLASSES):
    """Host-side (numpy) dataset: class-balanced, deterministic in seed.

    Same contract as data.pipeline.synthetic_dataset: (images [n,h,w,3]
    uint8, labels [n] int32) — feed through DataPipeline, whose
    preprocess_batch normalizes to [-1, 1] (training on the float stream
    must normalize identically: pixels * 2 - 1). Rendered on the CPU
    backend in chunks so it never touches (or waits on) the TPU tunnel.
    """
    labels = np.arange(n, dtype=np.int32) % num_classes
    rng = np.random.default_rng(seed)
    rng.shuffle(labels)
    cpu = jax.devices("cpu")[0]
    imgs = np.empty((n, image_size, image_size, 3), np.uint8)
    chunk = 512
    with jax.default_device(cpu):
        for i in range(0, n, chunk):
            lab = jnp.asarray(labels[i:i + chunk])
            key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
            imgs[i:i + lab.shape[0]] = np.asarray(
                jnp.round(render_batch(key, lab, image_size=image_size)
                          * 255.0).astype(jnp.uint8))
    return imgs, labels
