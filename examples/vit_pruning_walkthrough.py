"""Manual 2SSP-on-ViT walkthrough — script form of the reference's exploration
notebook (experiments/vit_pruning/vit_pruning.ipynb): run each pipeline stage
by hand and inspect the intermediate artifacts.

  python examples/vit_pruning_walkthrough.py            # tiny model, CPU-fast
  python examples/vit_pruning_walkthrough.py --model google/vit-base-patch16-224
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--target", type=float, default=0.25)
    ap.add_argument("--backend", default="cpu", choices=["default", "cpu", "tpu"])
    args = ap.parse_args()
    if args.backend != "default":
        jax.config.update("jax_platforms", args.backend)

    from ssp_x_vit_tpu.cli.common import resolve_model, resolve_dataset
    from ssp_x_vit_tpu.evaluation import evaluate_top1, measure_latency
    from ssp_x_vit_tpu.pruning import (
        plan_2ssp_allocation, count_total_params, compute_actual_sparsity,
        compute_ffn_activation_importance, select_keep_indices,
        materialize_width_pruning, materialize_depth_pruning,
    )
    from ssp_x_vit_tpu.pruning.depth import copy_replace_attention_importance, \
        select_attention_blocks_to_prune

    # ---- 1. model + data -------------------------------------------------
    params, cfg = resolve_model(args.model, num_classes=10)
    _, test, calib = resolve_dataset("synthetic", cfg)
    test_b, calib_b = test.batches(3), calib.batches()
    print(f"model: {cfg.num_layers} layers, hidden {cfg.hidden_size}, "
          f"{count_total_params(cfg)/1e6:.2f}M params")

    # ---- 2. plan the (K, t) allocation ----------------------------------
    plan = plan_2ssp_allocation(cfg, args.target, min_remaining=max(32, cfg.intermediate_size // 4))
    print(f"\nplan: remove attention in K={plan.blocks_to_prune} blocks, "
          f"t={plan.per_block_neurons_to_prune} neurons/block "
          f"(est. error {plan.est_error_params} params)")

    # ---- 3. importances on the DENSE model -------------------------------
    mlp_imp = compute_ffn_activation_importance(params, cfg, calib_b)
    att_imp, baseline_acc = copy_replace_attention_importance(
        params, cfg, test_b, batch_limit=3, verbose=False)
    print(f"\nFFN importance stats: mean={mlp_imp.mean():.4f}, "
          f"per-block min neuron importances: {np.round(mlp_imp.min(axis=1), 4)}")
    print(f"attention impacts (top-1 drop per block): {np.round(att_imp, 4)}")

    # ---- 4. stage-1 width ------------------------------------------------
    width = select_keep_indices(mlp_imp, n_to_prune_per_block=[plan.per_block_neurons_to_prune] * cfg.num_layers,
                                min_remaining=32, verbose=False)
    p1, c1 = materialize_width_pruning(params, cfg, width.keep_indices)
    print(f"\nafter stage-1: {count_total_params(c1)/1e6:.2f}M params")

    # ---- 5. stage-2 depth ------------------------------------------------
    blocks = select_attention_blocks_to_prune(att_imp, plan.blocks_to_prune)
    p2, c2 = materialize_depth_pruning(p1, c1, blocks) if blocks else (p1, c1)
    print(f"after stage-2 (attention removed in {blocks}): "
          f"{count_total_params(c2)/1e6:.2f}M params")

    # ---- 6. results ------------------------------------------------------
    sp = compute_actual_sparsity(count_total_params(cfg), count_total_params(c2))
    acc = evaluate_top1(p2, c2, test_b)
    lat0 = measure_latency(params, cfg, batch_size=1, iters=5)
    lat2 = measure_latency(p2, c2, batch_size=1, iters=5)
    print(f"\nachieved sparsity: {sp:.4f} (target {args.target})")
    print(f"top-1: {baseline_acc:.4f} -> {acc:.4f}")
    print(f"latency b=1: {lat0:.2f}ms -> {lat2:.2f}ms")


if __name__ == "__main__":
    main()
