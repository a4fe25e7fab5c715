"""Reproducibility seeding (reference src/utilities.py:13-19)."""

from __future__ import annotations

import logging
import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return a fresh jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    logging.info(f"Seed for reproducibility: {seed}")
    return jax.random.PRNGKey(seed)
