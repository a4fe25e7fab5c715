"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Mirrors the reference's tiny-config testing strategy (SURVEY.md §4) on the JAX
side: tests run on a virtual 8-device CPU mesh so sharded code paths are
exercised without TPU hardware.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS from the environment; jax.config is the reliable switch.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params  # noqa: E402


TINY = ViTConfig(
    image_size=32,
    patch_size=8,
    hidden_size=64,
    num_layers=4,
    num_heads=4,
    intermediate_size=128,
    num_classes=10,
)


@pytest.fixture(autouse=True, scope="module")
def _bounded_compiled_program_count():
    """XLA's CPU compiler sporadically SEGFAULTS after ~1000 cumulative
    compiles in one process (jax 0.9.0; observed at a different,
    individually-green test each run, always inside
    backend_compile_and_load). Dropping compiled executables between test
    modules keeps the live-program count bounded. Costs a few recompiles
    for cross-test jits within a later module; the alternative is running
    the suite in several processes."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def tiny_cfg() -> ViTConfig:
    return TINY


@pytest.fixture(scope="session")
def tiny_params(tiny_cfg):
    return init_vit_params(jax.random.PRNGKey(0), tiny_cfg)


@pytest.fixture(scope="session")
def tiny_batches(tiny_cfg):
    from ssp_x_vit_tpu.data.pipeline import DataPipeline, synthetic_dataset

    imgs, labels = synthetic_dataset(128, tiny_cfg.num_classes, image_size=tiny_cfg.image_size, seed=0)
    pipe = DataPipeline(imgs, labels, img_size=tiny_cfg.image_size, batch_size=32)
    return pipe.batches()
