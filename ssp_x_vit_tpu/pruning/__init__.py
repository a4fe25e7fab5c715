from ssp_x_vit_tpu.pruning.accounting import (
    count_total_params,
    count_block_params,
    count_attention_params_per_block,
    count_ffn_params_per_block,
    compute_actual_sparsity,
)
from ssp_x_vit_tpu.pruning.planner import TwoSSPPlan, plan_2ssp_allocation
from ssp_x_vit_tpu.pruning.width import (
    compute_ffn_activation_importance,
    weight_l1_importance,
    select_keep_indices,
    materialize_width_pruning,
)
from ssp_x_vit_tpu.pruning.depth import (
    heuristic_attention_importance,
    copy_replace_attention_importance,
    materialize_depth_pruning,
)
from ssp_x_vit_tpu.pruning.two_ssp import two_ssp_prune_vit

__all__ = [
    "count_total_params",
    "count_block_params",
    "count_attention_params_per_block",
    "count_ffn_params_per_block",
    "compute_actual_sparsity",
    "TwoSSPPlan",
    "plan_2ssp_allocation",
    "compute_ffn_activation_importance",
    "weight_l1_importance",
    "select_keep_indices",
    "materialize_width_pruning",
    "heuristic_attention_importance",
    "copy_replace_attention_importance",
    "materialize_depth_pruning",
    "two_ssp_prune_vit",
]
