"""2SSP auto-allocation planner: one target sparsity -> (K depth blocks, t neurons/block).

Pure-arithmetic port of the reference planner, preserving its exact search
semantics (reference src/vit_pruning.py:586-769): paper formula
``K = round(B * s ** (W_FFN / (alpha * W_Attn)))`` with alpha=1.5, a K +/- 2
neighborhood search, local t tweaks of (-1, +1, +2, -2), a 2%-of-target
tolerance that prefers larger K among near-equal solutions, and the
anti-degenerate fallback that forces K >= 1 when the budget is at least half
an attention block. The idiosyncrasies (tie-break order, tolerance semantics)
are intentionally reproduced, not "improved" — plans must match the reference
block-for-block and neuron-for-neuron.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional

from ssp_x_vit_tpu.models.vit import ViTConfig
from ssp_x_vit_tpu.pruning.accounting import (
    count_attention_params_per_block,
    count_block_params,
    count_ffn_params_per_block,
    count_total_params,
)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TwoSSPPlan:
    """(reference src/vit_pruning.py:564-572)"""

    target_sparsity: float
    num_blocks_total: int
    blocks_to_prune: int
    per_block_neurons_to_prune: int
    stage2_fraction: float
    estimated_total_removed_params: int
    est_error_params: int


def _estimate_width_removal_per_block(hidden: int, t_remove: int) -> int:
    """Removing t neurons removes t*(2*hidden+1) params per block
    (fc1 row + bias, fc2 col; reference src/vit_pruning.py:575-583)."""
    if t_remove <= 0:
        return 0
    return t_remove * (2 * hidden + 1)


def plan_2ssp_allocation(
    cfg: ViTConfig,
    target_sparsity: float,
    min_remaining: int = 256,
    forced_blocks: Optional[int] = None,
) -> TwoSSPPlan:
    assert 0.0 < target_sparsity < 1.0, "target_sparsity must be in (0,1)"

    total_params = count_total_params(cfg)
    block_params = count_block_params(cfg)
    B = len(block_params)
    P_target = int(round(total_params * target_sparsity))

    hidden = cfg.hidden_size
    inter_sizes: List[int] = [cfg.logical_block_intermediate(i) for i in range(B)]

    max_removable_per_block = [max(0, inter - min_remaining) for inter in inter_sizes]
    t_max_uniform = min(max_removable_per_block) if max_removable_per_block else 0

    denom_const = B * (2 * hidden + 1)
    print(f"[PLAN-LOG] B={B}, target_sparsity={target_sparsity}, P_target={P_target}")
    print(f"[PLAN-LOG] hidden={hidden}, inter_sizes={inter_sizes}, min_remaining={min_remaining}")
    print(f"[PLAN-LOG] total_params={total_params}, block_params={block_params}")
    print(f"[PLAN-LOG] t_max_uniform={t_max_uniform}, denom=B*(2*hidden+1)={denom_const}")

    tol = max(1, int(0.02 * P_target))
    best = None

    attn_param_counts = count_attention_params_per_block(cfg)
    P_attn_mean = sum(attn_param_counts) / max(1, B)

    ffn_param_counts = count_ffn_params_per_block(cfg)
    W_FFN = sum(ffn_param_counts) / max(1, B)
    W_Attn = P_attn_mean
    alpha = 1.5

    print(f"[PLAN-LOG] attn_params_per_block={attn_param_counts}")
    print(f"[PLAN-LOG] ffn_params_per_block={ffn_param_counts}")
    print(f"[PLAN-LOG] mean_params_per_block: W_FFN_avg={int(W_FFN)}, W_Attn_avg={int(W_Attn)}, alpha={alpha}")
    exponent = W_FFN / (alpha * W_Attn) if W_Attn > 0 else float("inf")
    print(f"[PLAN-LOG] exponent = W_FFN/(alpha*W_Attn) = {exponent if exponent != float('inf') else 'inf'}")

    if forced_blocks is not None:
        K_values = [max(0, min(B - 1, int(forced_blocks)))]
        print(f"[PLAN-LOG] forced_blocks provided: K_values={K_values}")
    else:
        K_formula = int(round(B * (target_sparsity**exponent))) if W_Attn > 0 else 0
        K_formula = max(0, min(B - 1, K_formula))
        neighborhood = sorted(set(K_formula + dd for dd in (-2, -1, 0, 1, 2)))
        K_values = [k for k in neighborhood if 0 <= k <= B - 1]
        print(f"[PLAN-LOG] K_formula={K_formula}, K_candidates={K_values}")

    denom = B * (2 * hidden + 1)

    def consider(cand, cur_best):
        """Prefer strictly smaller error; within tolerance prefer larger K."""
        if cur_best is None:
            return cand
        err, K, _, _ = cand
        best_err, best_K, _, _ = cur_best
        if (err < best_err - tol) or (abs(err - best_err) <= tol and K > best_K):
            return cand
        return cur_best

    for K in K_values:
        P_removed_depth = int(round(K * P_attn_mean))
        P_remaining = max(0, P_target - P_removed_depth)
        t = int(round(P_remaining / denom)) if denom > 0 else 0
        t = max(0, min(t, t_max_uniform))

        P_removed_width = _estimate_width_removal_per_block(hidden, t) * B
        best = consider((abs(P_target - (P_removed_depth + P_removed_width)), K, t,
                         P_removed_depth + P_removed_width), best)

        for dt in (-1, 1, 2, -2):
            tt = max(0, min(t + dt, t_max_uniform))
            P_w = _estimate_width_removal_per_block(hidden, tt) * B
            best = consider((abs(P_target - (P_removed_depth + P_w)), K, tt,
                             P_removed_depth + P_w), best)

    # Anti-degenerate fallback: avoid all-width (K=0) solutions when the target
    # budget is at least half an attention block (reference :710-738).
    if best is not None and forced_blocks is None:
        best_err, best_K, best_t, best_total = best
        if best_K == 0 and P_attn_mean > 0 and P_target >= 0.5 * P_attn_mean:
            K_guess = max(1, int(round(P_target / max(1, P_attn_mean))))
            K_cand_max = min(B - 1, K_guess + 2)
            best_alt = None
            for K_alt in range(1, K_cand_max + 1):
                P_d = int(round(K_alt * P_attn_mean))
                P_rem = max(0, P_target - P_d)
                t_alt = int(round(P_rem / denom)) if denom > 0 else 0
                t_alt = max(0, min(t_alt, t_max_uniform))
                P_w = _estimate_width_removal_per_block(hidden, t_alt) * B
                best_alt = consider((abs(P_target - (P_d + P_w)), K_alt, t_alt, P_d + P_w), best_alt)
            if best_alt is not None:
                alt_err = best_alt[0]
                if (alt_err < best_err - tol) or (abs(alt_err - best_err) <= tol):
                    best = best_alt

    if best is None:
        return TwoSSPPlan(
            target_sparsity=target_sparsity,
            num_blocks_total=B,
            blocks_to_prune=0,
            per_block_neurons_to_prune=0,
            stage2_fraction=0.0,
            estimated_total_removed_params=0,
            est_error_params=P_target,
        )

    err, K_best, t_best, P_removed_est = best
    P_removed_depth_chosen = int(round(K_best * P_attn_mean))
    P_removed_width_chosen = _estimate_width_removal_per_block(hidden, t_best) * B
    stage2_fraction_chosen = (K_best / B) if B > 0 else 0.0
    print(f"[PLAN-LOG] chosen: K={K_best}, t={t_best}, stage2_fraction={stage2_fraction_chosen:.6f}")
    print(f"[PLAN-LOG] removal_depth(attn)={P_removed_depth_chosen}, "
          f"removal_width(ffn)={P_removed_width_chosen}, total={P_removed_est}, "
          f"target={P_target}, err={int(err)}")

    return TwoSSPPlan(
        target_sparsity=target_sparsity,
        num_blocks_total=B,
        blocks_to_prune=K_best,
        per_block_neurons_to_prune=t_best,
        stage2_fraction=stage2_fraction_chosen,
        estimated_total_removed_params=P_removed_est,
        est_error_params=int(err),
    )
