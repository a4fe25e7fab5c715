"""Native batch-assembly library vs numpy reference."""

import numpy as np
import pytest

from ssp_x_vit_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (50, 16, 12, 3), dtype=np.uint8)


def _numpy_gather(images, idx, flips):
    out = images[idx].copy()
    if flips is not None:
        sel = flips.astype(bool)
        out[sel] = out[sel, :, ::-1]
    return out


def test_native_builds_and_matches(dataset):
    if not nl.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 50, 17)
    flips = (rng.random(17) < 0.5).astype(np.uint8)
    native = nl.gather_batch(dataset, idx, flips)
    ref = _numpy_gather(dataset, idx, flips)
    np.testing.assert_array_equal(native, ref)


def test_native_no_flip(dataset):
    if not nl.available():
        pytest.skip("native toolchain unavailable")
    idx = np.asarray([3, 1, 4, 1, 5])
    np.testing.assert_array_equal(nl.gather_batch(dataset, idx, None), dataset[idx])


def test_normalize_matches(dataset):
    if not nl.available():
        pytest.skip("native toolchain unavailable")
    batch = dataset[:8]
    mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    native = nl.normalize_batch(batch, mean, std)
    ref = (batch.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(native, ref, rtol=1e-6, atol=1e-6)
