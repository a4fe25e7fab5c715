"""Input pipeline: CIFAR-10/100 loaders + deterministic synthetic fallback.

Reference pipeline (experiments/vit_pruning/auto_2ssp.py:146-228): HF-datasets
CIFAR, bicubic resize to 224, normalize with the processor's mean/std (0.5 for
the ViT family), random horizontal flip on train, batch sizes 32/64/64, and a
calibration subset with the first ``calib_per_class`` images of each class.

TPU-native differences:

- preprocessing (resize + normalize) is vectorized jax on-device, batched —
  not per-image PIL transforms;
- channels-last [b, H, W, C] layout;
- with no dataset on disk (zero-egress environments), a deterministic
  synthetic dataset with class-dependent structure stands in so every pipeline
  stage (calibration, eval, finetune) stays exercisable end-to-end.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_VIT_MEAN = (0.5, 0.5, 0.5)
IMAGENET_VIT_STD = (0.5, 0.5, 0.5)


@functools.partial(jax.jit, static_argnames=("img_size",))
def preprocess_batch(images_u8: jax.Array, img_size: int) -> jax.Array:
    """[b, h, w, 3] uint8 -> [b, img_size, img_size, 3] float32 normalized.

    Bicubic resize + (x/255 - 0.5)/0.5 normalization, fused on device.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (img_size, img_size):
        x = jax.image.resize(x, (b, img_size, img_size, c), method="cubic")
    mean = jnp.asarray(IMAGENET_VIT_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_VIT_STD, jnp.float32)
    return (x - mean) / std


@dataclasses.dataclass
class DataPipeline:
    """Array-backed dataset -> preprocessed batch iterator."""

    images: np.ndarray  # [N, h, w, 3] uint8
    labels: np.ndarray  # [N] int32
    img_size: int = 224
    batch_size: int = 64
    shuffle: bool = False
    seed: int = 0
    flip: bool = False  # random horizontal flip (train augmentation)
    drop_remainder: bool = False

    def __post_init__(self):
        assert self.images.shape[0] == self.labels.shape[0]

    def __len__(self) -> int:
        n = self.images.shape[0]
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return int(self.images.shape[0])

    def __iter__(self) -> Iterator[dict]:
        n = self.images.shape[0]
        order = np.arange(n)
        rng = np.random.default_rng(self.seed)
        if self.shuffle:
            rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_remainder else n
        from ssp_x_vit_tpu.data.native_loader import gather_batch

        for start in range(0, end, self.batch_size):
            idx = order[start : start + self.batch_size]
            flips = (rng.random(len(idx)) < 0.5).astype(np.uint8) if self.flip else None
            imgs = gather_batch(self.images, idx, flips)
            px = preprocess_batch(jnp.asarray(imgs), self.img_size)
            yield {"pixel_values": px, "labels": jnp.asarray(self.labels[idx].astype(np.int32))}

    def batches(self, max_batches: Optional[int] = None) -> List[dict]:
        out = []
        for i, b in enumerate(self):
            if max_batches is not None and i >= max_batches:
                break
            out.append(b)
        return out

    def iter_prefetch(self, size: int = 2) -> Iterator[dict]:
        """Iterate with background prefetch (see ``prefetch``)."""
        return prefetch(iter(self), size=size)


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run an iterator in a background thread, ``size`` items ahead.

    Host-side batch assembly (native gather, numpy staging) and the H2D
    transfer dispatch overlap with device compute on the consumer side —
    the streaming counterpart of materializing ``batches()`` up front.
    Exceptions from the producer re-raise at the consumption point.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    sentinel = object()
    errors: list = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            errors.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if errors:
                raise errors[0]
            return
        yield item


def synthetic_dataset(
    num_samples: int,
    num_classes: int,
    *,
    image_size: int = 32,
    seed: int = 0,
    noise: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic class-structured images: per-class low-frequency pattern
    + Gaussian noise. Learnable by a linear probe, so accuracy-based pipeline
    stages behave realistically without any downloaded dataset."""
    rng = np.random.default_rng(seed)
    base = rng.normal(0.0, 1.0, (num_classes, 8, 8, 3))
    labels = (np.arange(num_samples) % num_classes).astype(np.int32)
    rng.shuffle(labels)
    patterns = base[labels]  # [N, 8, 8, 3]
    # Host-side generation: resizing on the accelerator and fetching hundreds
    # of MB back hangs on tunneled devices (docs/tpu_notes.md) and wastes HBM.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        imgs = np.asarray(
            jax.image.resize(jnp.asarray(patterns),
                             (num_samples, image_size, image_size, 3), "linear")
        )
    imgs = imgs + rng.normal(0.0, noise, imgs.shape)
    imgs = (imgs - imgs.min()) / max(1e-9, imgs.max() - imgs.min())
    return (imgs * 255).astype(np.uint8), labels


def _load_cifar_arrays(name: str, root: Optional[str]) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Try torchvision CIFAR from disk (no download). Returns train/test arrays or None."""
    try:
        from torchvision.datasets import CIFAR10, CIFAR100

        cls = CIFAR10 if name == "cifar10" else CIFAR100
        for candidate in filter(None, [root, "./data", "/root/data", "/data"]):
            try:
                tr = cls(candidate, train=True, download=False)
                te = cls(candidate, train=False, download=False)
                return (
                    np.asarray(tr.data, np.uint8), np.asarray(tr.targets, np.int32),
                    np.asarray(te.data, np.uint8), np.asarray(te.targets, np.int32),
                )
            except Exception:
                continue
    except Exception:
        pass
    return None


def load_cifar(
    dataset: str = "cifar10",
    *,
    root: Optional[str] = None,
    train_pct: float = 0.25,
    test_pct: float = 0.25,
    calib_per_class: int = 2,
    img_size: int = 224,
    batch_size_train: int = 32,
    batch_size_eval: int = 64,
    seed: int = 0,
    allow_synthetic: bool = True,
) -> Tuple[DataPipeline, DataPipeline, DataPipeline]:
    """(train, test, calibration) pipelines, reference split/calibration rules.

    Falls back to the synthetic dataset when CIFAR is not on disk (offline
    environments) unless ``allow_synthetic=False``.
    """
    ds_name = dataset.lower()
    assert ds_name in ("cifar10", "cifar100"), f"Unsupported dataset: {dataset}"
    num_classes = 10 if ds_name == "cifar10" else 100

    arrays = _load_cifar_arrays(ds_name, root)
    if arrays is None:
        if not allow_synthetic:
            raise FileNotFoundError(f"{ds_name} not found on disk and downloads are disabled")
        print(f"[INFO] {ds_name} not found on disk; using deterministic synthetic stand-in")
        tr_x, tr_y = synthetic_dataset(2048, num_classes, seed=seed)
        te_x, te_y = synthetic_dataset(1024, num_classes, seed=seed + 1)
    else:
        tr_x, tr_y, te_x, te_y = arrays

    n_train = int(len(tr_x) * train_pct) if train_pct is not None else len(tr_x)
    n_test = int(len(te_x) * test_pct) if test_pct is not None else len(te_x)

    # Calibration: first calib_per_class examples of each class from the FULL
    # train split (reference auto_2ssp.py:199-221).
    counts = np.zeros((num_classes,), np.int64)
    calib_idx = []
    for i, y in enumerate(tr_y):
        if counts[y] < calib_per_class:
            calib_idx.append(i)
            counts[y] += 1
            if counts.min() >= calib_per_class:
                break
    calib_idx = np.asarray(calib_idx, np.int64)

    train = DataPipeline(tr_x[:n_train], tr_y[:n_train], img_size=img_size,
                         batch_size=batch_size_train, shuffle=True, seed=seed, flip=True)
    test = DataPipeline(te_x[:n_test], te_y[:n_test], img_size=img_size,
                        batch_size=batch_size_eval, shuffle=False, seed=seed)
    calib = DataPipeline(tr_x[calib_idx], tr_y[calib_idx], img_size=img_size,
                         batch_size=batch_size_eval, shuffle=True, seed=seed, flip=True)
    return train, test, calib
