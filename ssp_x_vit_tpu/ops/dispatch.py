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


def use_pallas() -> bool:
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("SSP_X_VIT_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    # Default OFF: measured on a v5e chip (scripts/tpu_smoke.py + in-graph scan
    # timing), XLA's fused attention/FFN beat the v1 Pallas kernels at ViT
    # shapes (e.g. b=256 attention 3.4ms XLA vs 6.6ms pallas). The kernels are
    # correct and selectable (SSP_X_VIT_PALLAS=1 / set_pallas_enabled) while
    # tile tuning continues; dispatch flips back on once they win.
    return False
