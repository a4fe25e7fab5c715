"""Dispatch-gate re-measurement for fused_attn_block_v2: regimes where v1
LOST to XLA (width-pruned models with XLA FFN; small batch). Decides whether
the FFN_PALLAS_MIN_WIDTH coupling and batch gates still apply to v2."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
from ssp_x_vit_tpu.models.vit import (
    ViTConfig, init_vit_params, vit_forward, vit_forward_materialized,
)
from ssp_x_vit_tpu.pruning import (
    materialize_width_pruning, plan_2ssp_allocation, select_keep_indices,
    weight_l1_importance,
)
import ssp_x_vit_tpu.ops.dispatch as dispatch


def main():
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    cfg = ViTConfig(num_classes=1000)
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    plan = plan_2ssp_allocation(cfg, 0.5, min_remaining=256)
    width = select_keep_indices(
        weight_l1_importance(params),
        n_to_prune_per_block=[plan.per_block_neurons_to_prune] * cfg.num_layers,
        min_remaining=256, verbose=False)
    p2, c2 = materialize_width_pruning(params, cfg, width.keep_indices)

    px256 = jax.random.normal(jax.random.PRNGKey(1), (256, 224, 224, 3), jnp.bfloat16)
    px1 = px256[:1]

    res = {"pruned_width": c2.padded_intermediate_size}

    def fwd_mat(pixels, p):
        return vit_forward_materialized(p, pixels, c2, compute_dtype=jnp.bfloat16)

    def fwd(pixels, p):
        return vit_forward(p, pixels, cfg, compute_dtype=jnp.bfloat16)[0]

    def fwd_noattn(pixels, p):
        return vit_forward(p, pixels, cfg, compute_dtype=jnp.bfloat16,
                           allow_fused_attn=False)[0]

    # Pruned model b=256: fused attn gate currently OFF below width 2048.
    # Force-compare by lifting the width gate.
    orig = dispatch.FFN_PALLAS_MIN_WIDTH
    res["pruned_b256_gate_off_ms"] = round(
        measure_latency_scan(fwd_mat, px256, p2, iters=iters), 2)
    dispatch.FFN_PALLAS_MIN_WIDTH = 0
    try:
        res["pruned_b256_v2_ms"] = round(
            measure_latency_scan(fwd_mat, px256, p2, iters=iters), 2)
        res["pruned_b1_v2_ms"] = round(
            measure_latency_scan(fwd_mat, px1, p2, iters=20), 3)
    finally:
        dispatch.FFN_PALLAS_MIN_WIDTH = orig
    res["pruned_b1_gate_off_ms"] = round(
        measure_latency_scan(fwd_mat, px1, p2, iters=20), 3)

    # Dense b=1: batch gate currently requires b >= 8.
    res["dense_b1_xla_ms"] = round(
        measure_latency_scan(fwd_noattn, px1, params, iters=20), 3)
    orig_b = dispatch.FUSED_ATTN_MIN_BATCH
    dispatch.FUSED_ATTN_MIN_BATCH = 1
    try:
        res["dense_b1_v2_ms"] = round(
            measure_latency_scan(fwd, px1, params, iters=20), 3)
    finally:
        dispatch.FUSED_ATTN_MIN_BATCH = orig_b

    print(json.dumps(res))


if __name__ == "__main__":
    main()
