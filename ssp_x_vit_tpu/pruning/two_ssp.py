"""End-to-end 2SSP pruning of a ViT classifier (stage-1 width + stage-2 depth).

Orchestrates the TPU-native pipeline that the reference spreads across
``experiments/vit_pruning/auto_2ssp.py:506-911`` and
``pruning_srp-main/mask_conjunction.py:236-362``:

1. plan (K, t) from the target sparsity (planner.py, exact reference algorithm)
2. attention importance on the DENSE model: vmapped skip-gate candidates
   ("copy" mode) or position heuristic
3. FFN neuron importance on the DENSE model: fused activation-L2 side-outputs
4. stage-1: materialize width pruning (gather kept rows/cols)
5. stage-2: materialize depth pruning of the K least-important attentions
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ssp_x_vit_tpu.models.vit import Params, ViTConfig
from ssp_x_vit_tpu.pruning.planner import TwoSSPPlan, plan_2ssp_allocation
from ssp_x_vit_tpu.pruning.width import (
    compute_ffn_activation_importance,
    weight_l1_importance,
    select_keep_indices,
    materialize_width_pruning,
    WidthPruneResult,
)
from ssp_x_vit_tpu.pruning.depth import (
    copy_replace_attention_importance,
    heuristic_attention_importance,
    select_attention_blocks_to_prune,
    materialize_depth_pruning,
)


@dataclasses.dataclass
class TwoSSPResult:
    plan: TwoSSPPlan
    att_importance: np.ndarray          # [L]
    mlp_importance: np.ndarray          # [L, d_int]
    width: Optional[WidthPruneResult]
    pruned_attention_blocks: List[int]
    baseline_accuracy: Optional[float]


def two_ssp_prune_vit(
    params: Params,
    cfg: ViTConfig,
    target_sparsity: float,
    *,
    calibration_batches: Optional[Sequence[dict]] = None,
    eval_batches: Optional[Sequence[dict]] = None,
    importance_mode: str = "copy",
    batch_limit: int = 5,
    min_remaining: int = 256,
    forced_blocks: Optional[int] = None,
    stage: str = "both",  # "s1" | "s2" | "both"
) -> Tuple[Params, ViTConfig, TwoSSPResult]:
    plan = plan_2ssp_allocation(cfg, target_sparsity, min_remaining=min_remaining,
                                forced_blocks=forced_blocks)

    # --- importances on the dense model (reference Auto2SSPInterface.fit) ---
    baseline = None
    if importance_mode == "copy" and eval_batches is not None:
        att_imp, baseline = copy_replace_attention_importance(
            params, cfg, eval_batches, batch_limit=batch_limit, verbose=False
        )
    else:
        att_imp = heuristic_attention_importance(cfg.num_layers)

    if calibration_batches is not None:
        mlp_imp = compute_ffn_activation_importance(params, cfg, calibration_batches)
    else:
        mlp_imp = weight_l1_importance(params)

    out_params, out_cfg = params, cfg
    width_result = None

    if stage in ("s1", "both") and plan.per_block_neurons_to_prune > 0:
        width_result = select_keep_indices(
            mlp_imp,
            n_to_prune_per_block=[plan.per_block_neurons_to_prune] * cfg.num_layers,
            min_remaining=min_remaining,
        )
        out_params, out_cfg = materialize_width_pruning(out_params, out_cfg, width_result.keep_indices)

    pruned_blocks: List[int] = []
    if stage in ("s2", "both") and plan.blocks_to_prune > 0:
        pruned_blocks = select_attention_blocks_to_prune(att_imp, plan.blocks_to_prune)
        out_params, out_cfg = materialize_depth_pruning(out_params, out_cfg, pruned_blocks)

    result = TwoSSPResult(
        plan=plan,
        att_importance=np.asarray(att_imp, np.float32),
        mlp_importance=np.asarray(mlp_imp, np.float32),
        width=width_result,
        pruned_attention_blocks=pruned_blocks,
        baseline_accuracy=baseline,
    )
    return out_params, out_cfg, result
