"""Stage-2 attention depth pruning: importance, selection, materialization.

Reference semantics (src/vit_pruning.py:380-520):

- selection modes: explicit indices; position heuristic
  ``i if i < B/2 else B - i`` (lowest pruned first); or "copy" mode — measure
  the top-1 drop from bypassing each block's attention and prune the K blocks
  with the smallest drop;
- pruning replaces attention with a zero bypass (residual passes through);
- at least one block keeps its attention (num_to_prune <= B-1).

TPU-native difference: "copy" mode needs no copies — all B candidate bypasses
are evaluated simultaneously by vmapping the skip-gate vector over one batched
forward (evaluation.evaluate_top1_candidates).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.models.vit import Params, ViTConfig
from ssp_x_vit_tpu.evaluation.classify import evaluate_top1, evaluate_top1_candidates


def heuristic_attention_importance(num_layers: int) -> np.ndarray:
    """Position heuristic: centre blocks most important, edges least
    (reference src/vit_pruning.py:459)."""
    return np.asarray(
        [(i if i < num_layers / 2 else num_layers - i) for i in range(num_layers)],
        np.float32,
    )


def copy_replace_attention_importance(
    params: Params,
    cfg: ViTConfig,
    batches,
    *,
    batch_limit: int = 5,
    neuron_mask=None,
    verbose: bool = True,
) -> Tuple[np.ndarray, float]:
    """Impact of bypassing each block's attention, measured as top-1 drop.

    Returns (impacts [num_layers], baseline_accuracy). The reference runs B
    sequential deepcopy+eval loops (src/vit_pruning.py:477-496); here one
    vmapped pass evaluates the baseline and all B bypass candidates together.
    ``batches`` must be re-iterable (a list) since candidates and baseline
    share the same data.
    """
    L = cfg.num_layers
    batches = list(batches)[: batch_limit if batch_limit is not None else None]
    # Row 0 = baseline (no skip), rows 1..L = skip block i-1.
    gates = np.ones((L + 1, L), np.float32)
    for i in range(L):
        gates[i + 1, i] = 0.0
    accs = evaluate_top1_candidates(
        params, cfg, batches, gates, neuron_mask=neuron_mask, max_batches=batch_limit
    )
    baseline = float(accs[0])
    impacts = np.maximum(0.0, baseline - accs[1:]).astype(np.float32)
    if verbose:
        print(f"Baseline accuracy: {baseline:.4f}")
        for i in range(L):
            print(f"[Attn] Block {i} impact: {impacts[i]:.4f}", flush=True)
    return impacts, baseline


def select_attention_blocks_to_prune(
    importance: np.ndarray,
    num_to_prune: int,
) -> List[int]:
    """K blocks with the smallest importance, capped at B-1
    (reference src/vit_pruning.py:441-460, 496)."""
    L = len(importance)
    num_to_prune = max(0, min(L - 1, int(num_to_prune)))
    order = sorted(range(L), key=lambda i: importance[i])
    return sorted(order[:num_to_prune])


def attention_gate_from_pruned(num_layers: int, pruned: Sequence[int]) -> jnp.ndarray:
    gate = np.ones((num_layers,), np.float32)
    for i in pruned:
        gate[i] = 0.0
    return jnp.asarray(gate)


def materialize_depth_pruning(
    params: Params,
    cfg: ViTConfig,
    blocks_to_prune: Sequence[int],
) -> Tuple[Params, ViTConfig]:
    """Physically drop the attention weights of the pruned blocks.

    The stacked attention arrays are re-packed to only hold the surviving
    blocks' rows; ``cfg.pruned_attention_blocks`` records the removal and
    ``vit_forward_materialized`` statically skips those attention branches.
    ln1 (layernorm_before) is kept, matching the reference bypass which leaves
    it in place (src/vit_pruning.py:499-504 replace only ``.attention``).
    """
    pruned = tuple(sorted(set(int(i) for i in blocks_to_prune)))
    for i in pruned:
        if not (0 <= i < cfg.num_layers):
            raise ValueError(f"block index {i} out of range")
    if len(pruned) >= cfg.num_layers:
        raise ValueError("cannot prune attention in every block")
    if cfg.pruned_attention_blocks:
        raise ValueError("depth pruning already materialized for this config")

    # Device-side gather: only the tiny keep-index vector crosses host->device
    # (host slicing round-trips full weights over the relay, docs/tpu_notes.md).
    keep = jnp.asarray([i for i in range(cfg.num_layers) if i not in pruned],
                       jnp.int32)
    blocks = dict(params["blocks"])
    # ln1 stays full-length in LOGICAL param counts for pruned blocks, but the
    # materialized forward only reads rows for surviving blocks — so it is
    # also re-packed to the kept rows to match attn_store_index addressing.
    for name in ("qkv_kernel", "qkv_bias", "proj_kernel", "proj_bias",
                 "ln1_scale", "ln1_bias"):
        if name in blocks:
            blocks[name] = jnp.take(blocks[name], keep, axis=0)

    new_params = dict(params)
    new_params["blocks"] = blocks
    new_cfg = dataclasses.replace(cfg, pruned_attention_blocks=pruned)
    return new_params, new_cfg


@dataclasses.dataclass
class DepthPruneResult:
    pruned_indices: List[int]
    original_metrics: Optional[float]
    final_metrics: Optional[float]


def prune_vit_attention_blocks(
    params: Params,
    cfg: ViTConfig,
    *,
    sparsity: float = 0.0,
    num_to_prune: Optional[int] = None,
    selected_indices: Optional[Sequence[int]] = None,
    importance_mode: str = "copy",
    batches=None,
    batch_limit: int = 5,
    neuron_mask=None,
) -> Tuple[Params, ViTConfig, DepthPruneResult]:
    """Full stage-2 entry point mirroring reference prune_vit_attention_blocks
    (src/vit_pruning.py:380-520) but returning a new materialized model."""
    assert 0.0 <= sparsity < 1.0, "sparsity must be in [0,1)"
    L = cfg.num_layers
    if num_to_prune is None:
        num_to_prune = int(round(L * sparsity))
    num_to_prune = max(0, min(L - 1, int(num_to_prune)))

    if num_to_prune == 0:
        print("No attention submodules to prune (num_to_prune=0).")
        return params, cfg, DepthPruneResult([], None, None)

    original_metrics = None
    if selected_indices is not None:
        to_prune = sorted(set(i for i in selected_indices if 0 <= i < L))[:num_to_prune]
    elif batches is None or importance_mode.lower() == "heuristic":
        print("Using heuristic for attention pruning importance (position-based).")
        imp = heuristic_attention_importance(L)
        to_prune = select_attention_blocks_to_prune(imp, num_to_prune)
    else:
        print(f"Evaluating {L} blocks by impact of removing attention (vmapped skip-gates)...")
        impacts, original_metrics = copy_replace_attention_importance(
            params, cfg, batches, batch_limit=batch_limit, neuron_mask=neuron_mask
        )
        to_prune = select_attention_blocks_to_prune(impacts, num_to_prune)
        print(f"Selected blocks to remove attention: {to_prune}")

    new_params, new_cfg = materialize_depth_pruning(params, cfg, to_prune)

    final_metrics = None
    if batches is not None:
        final_metrics = evaluate_top1(new_params, new_cfg, batches, max_batches=batch_limit)
        print(f"Final accuracy after attention pruning: {final_metrics:.4f}")
        if original_metrics is not None:
            print(f"Accuracy change: {final_metrics - original_metrics:.4f}")

    return new_params, new_cfg, DepthPruneResult(sorted(to_prune), original_metrics, final_metrics)
