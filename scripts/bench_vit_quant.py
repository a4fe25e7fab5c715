"""ViT int8 weight-only benchmark on the TPU chip.

The reference's own latency protocol is BATCH-1 forward (MPS, 43.6 ms
dense, reports/report-2perc.md:21) — the weight-bound regime where int8
halves the stream. Also measures b=256 throughput (MXU-bound: expect ~no
gain, the dot still runs bf16 passes) and the 50%-2SSP-pruned + int8 stack.

  python scripts/bench_vit_quant.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
    from ssp_x_vit_tpu.models.quant import quantize_vit_params_int8
    from ssp_x_vit_tpu.models.vit import (
        ViTConfig, init_vit_params, vit_forward, vit_forward_materialized,
    )
    from ssp_x_vit_tpu.pruning import (
        plan_2ssp_allocation, select_keep_indices, weight_l1_importance,
        materialize_width_pruning, materialize_depth_pruning,
    )
    from ssp_x_vit_tpu.pruning.depth import (
        heuristic_attention_importance, select_attention_blocks_to_prune,
    )

    cfg = ViTConfig(num_classes=1000)  # ViT-B/16 @ 224
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qp = quantize_vit_params_int8(params, cfg)

    plan = plan_2ssp_allocation(cfg, 0.5, min_remaining=256)
    width = select_keep_indices(
        weight_l1_importance(params),
        n_to_prune_per_block=[plan.per_block_neurons_to_prune] * cfg.num_layers,
        min_remaining=256, verbose=False)
    p2, c2 = materialize_width_pruning(params, cfg, width.keep_indices)
    blocks = select_attention_blocks_to_prune(
        heuristic_attention_importance(cfg.num_layers), plan.blocks_to_prune)
    p2, c2 = materialize_depth_pruning(p2, c2, blocks)
    qp2 = quantize_vit_params_int8(p2, c2)

    res = {"backend": jax.default_backend()}

    def fwd(pixels, p):
        return vit_forward(p, pixels, cfg, compute_dtype=jnp.bfloat16)[0]

    def fwd_mat(pixels, p):
        return vit_forward_materialized(p, pixels, c2, compute_dtype=jnp.bfloat16)

    px1 = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3), jnp.bfloat16)
    px256 = jax.random.normal(jax.random.PRNGKey(1), (256, 224, 224, 3), jnp.bfloat16)

    res["dense_bf16_b1_ms"] = round(measure_latency_scan(fwd, px1, params, iters=20), 3)
    res["dense_int8_b1_ms"] = round(measure_latency_scan(fwd, px1, qp, iters=20), 3)
    res["dense_bf16_b256_ms"] = round(measure_latency_scan(fwd, px256, params, iters=10), 2)
    res["dense_int8_b256_ms"] = round(measure_latency_scan(fwd, px256, qp, iters=10), 2)
    res["pruned50_bf16_b1_ms"] = round(measure_latency_scan(fwd_mat, px1, p2, iters=20), 3)
    res["pruned50_int8_b1_ms"] = round(measure_latency_scan(fwd_mat, px1, qp2, iters=20), 3)
    res["int8_b1_speedup"] = round(res["dense_bf16_b1_ms"] / res["dense_int8_b1_ms"], 2)
    res["vs_reference_mps_43.6ms"] = round(43.6 / res["dense_int8_b1_ms"], 1)

    # W8A8: native int8 MXU (activations quantized per token, opt-in mode)
    from ssp_x_vit_tpu.ops import dispatch

    dispatch.set_w8a8_enabled(True)
    try:
        res["dense_w8a8_b256_ms"] = round(
            measure_latency_scan(fwd, px256, qp, iters=10), 2)
        res["dense_w8a8_b1_ms"] = round(
            measure_latency_scan(fwd, px1, qp, iters=20), 3)
    finally:
        dispatch.set_w8a8_enabled(None)
    res["w8a8_b256_speedup"] = round(
        res["dense_bf16_b256_ms"] / res["dense_w8a8_b256_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
