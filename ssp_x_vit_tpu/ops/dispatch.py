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


# Fused LN+QKV+attention+proj+residual ViT block kernel
# (ops/pallas/fused_attn_block.py). Measured on the v5e chip at ViT-B dims
# (b=256, s=197, d=768, 12 heads, bf16, scripts/bench_fused_attn_block.py):
# full XLA branch 7.39 ms vs fused kernel 6.70 ms (1.10x win; GROUP_BATCH
# sweep: g=1 6.81, g=2 6.70, g>=4 fails to compile). BUT on width-pruned
# materialized models (FFN below the pallas-FFN threshold, so the FFN runs in
# XLA) the extra kernel boundary costs more than the fusion saves: 50%-pruned
# ViT-B 58.3 ms (XLA branch) vs 62.1 ms (fused). Dispatch therefore requires
# the block's FFN width to be at/above FFN_PALLAS_MIN_WIDTH — the same
# regime where the FFN itself runs in pallas and no XLA epilogue fusion is
# lost. SSP_X_VIT_FUSED_ATTN=0/1 overrides. Details in docs/tpu_notes.md.
FUSED_ATTN_BLOCK_ENABLED = True
# Shape guards: lane-aligned hidden, MXU-friendly head_dim, batch >= 8.
FUSED_ATTN_MIN_BATCH = 8
# Keep in sync with the measured fused-FFN width crossover (docs/tpu_notes.md).
FFN_PALLAS_MIN_WIDTH = 2048


def use_fused_attn_block(x_shape, num_heads: int,
                         ffn_width: Optional[int] = None,
                         v2: bool = False) -> bool:
    """``v2`` = the full-MXU-projection kernel (even head count). Round-3
    measurements (scripts/bench_attn_v2_regimes.py): v2 wins in EVERY regime
    where v1 lost — width-pruned XLA-FFN models (71.6 vs 94.1 ms b=256) and
    b=1 (2.24 vs 2.42 ms) — so the FFN-width coupling and the batch floor
    only apply to the v1 fallback."""
    env = os.environ.get("SSP_X_VIT_FUSED_ATTN")
    enabled = FUSED_ATTN_BLOCK_ENABLED if env is None else env not in (
        "0", "false", "False")
    if not (enabled and use_pallas()):
        return False
    b, s, d = x_shape
    hd = d // num_heads
    if not v2:
        if ffn_width is not None and ffn_width < FFN_PALLAS_MIN_WIDTH:
            return False
        if b < FUSED_ATTN_MIN_BATCH:
            return False
    return d % 128 == 0 and hd % 64 == 0 and s <= 512


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


# ---------------- W8A8 (native int8 MXU) inference mode ----------------
# v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured on this
# chip: 132.8 TOPS vs 103.4 TF/s on a ViT-shaped matmul with per-iteration
# activation perturbation — docs/tpu_notes.md). Opt-in because activations
# are quantized dynamically (per-token scales): accuracy differs from the
# weight-only path. Enable via set_w8a8_enabled(True) or SSP_X_VIT_W8A8=1;
# applies wherever a weight-only-int8 pytree flows through mm_quant.
_W8A8: Optional[bool] = None


def set_w8a8_enabled(enabled: Optional[bool]) -> None:
    """Force W8A8 activation quantization on/off; None restores env/default."""
    global _W8A8
    _W8A8 = enabled


def use_w8a8() -> bool:
    if _W8A8 is not None:
        return _W8A8
    return os.environ.get("SSP_X_VIT_W8A8") in ("1", "true", "True")
