"""Central kernel dispatch: decide when to use Pallas TPU kernels.

Pallas kernels are used on TPU backends by default and can be forced on/off via
``SSP_X_VIT_PALLAS`` (values: "1"/"0") or :func:`set_pallas_enabled`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_FORCED: Optional[bool] = None


def set_pallas_enabled(enabled: Optional[bool]) -> None:
    """Force Pallas kernels on/off globally; ``None`` restores auto-detect."""
    global _FORCED
    _FORCED = enabled


# Minimum sequence length at which the flash-attention kernel beats XLA's
# fused attention on a v5e chip (measured with the in-graph scan harness,
# docs/tpu_notes.md): at s=2048 flash is ~1.8x faster (5.8ms vs 10.3ms,
# 48 vs 27 TF/s); at ViT's s=197 attention is transcendental/HBM-bound and
# XLA's fusion is at the practical floor (3.2ms vs 4.9ms for the best pallas
# variant). LLM sequences use flash; ViT sequences use XLA.
FLASH_MIN_SEQ = 1024


def use_pallas() -> bool:
    """Whether Pallas kernels are available/allowed on this backend.

    Individual ops apply their own measured shape thresholds on top
    (e.g. FLASH_MIN_SEQ); this gate only answers "is the TPU path usable".
    """
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("SSP_X_VIT_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"
