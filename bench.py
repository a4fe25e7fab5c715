"""Benchmark: ViT-B/16 dense forward throughput (images/sec/chip) on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference's dense ViT-B/16 batch-1 forward latency of 43.6 ms on
Apple-Silicon MPS (reports/report-2perc.md:21, BASELINE.md) = 22.9 images/sec.

Timing: in-graph `lax.scan` loop with a scalar value fetch as the barrier —
host-side `block_until_ready` timing is unreliable on the tunneled TPU (see
docs/tpu_notes.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan

REFERENCE_DENSE_IMG_PER_S = 1000.0 / 43.6  # b=1 MPS latency, reports/report-2perc.md:21


def _device_responsive(timeout_s: float) -> bool:
    """Probe the device with a tiny matmul under a watchdog.

    The tunnel can die mid-session (COVERAGE.md round-3 note) and then every
    dispatch — INCLUDING backend initialization itself (jax.devices()) —
    blocks forever; the driver's bench run would record nothing. The whole
    backend touch runs in a daemon thread so it cannot wedge the process."""
    import threading

    done = []

    def probe():
        jax.default_backend()  # backend init is the first thing that hangs
        x = jnp.ones((256, 256), jnp.bfloat16)
        done.append(float(jax.jit(lambda a: (a @ a).sum())(x)))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(done)


def _emit(value, detail):
    """Write full detail to BENCH_DETAIL.json; print ONE compact summary
    line (<1500 chars) as the FINAL stdout line. The driver captures only
    the tail of stdout — rounds 2-4 printed the full detail inline and the
    line outgrew the capture window (BENCH_r0N "parsed": null)."""
    here = os.path.dirname(os.path.abspath(__file__))
    full = {
        "metric": "vit_b16_dense_throughput",
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": round(value / REFERENCE_DENSE_IMG_PER_S, 2),
        "detail": detail,
    }
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(full, f, indent=1)

    loop = detail.get("pruning_loop_b16_224", {})
    serving = detail.get("llm_serving", {})
    summary = {
        "metric": "vit_b16_dense_throughput",
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": full["vs_baseline"],
        "detail": {
            "fresh_tpu_measurement": not detail.get("tpu_unreachable", False),
            "latency_b1_ms": detail.get("latency_b1_ms"),
            "mfu_vs_measured_ceiling": detail.get("mfu_vs_measured_ceiling"),
            "pruned50_images_per_sec": detail.get("pruned50_images_per_sec"),
            "pruning_loop_speedup_total_x": loop.get("speedup", {}).get("total"),
            "pruning_loop_speedup_stage1_x": loop.get("speedup", {}).get("stage1"),
            "north_star_target_x": 20.0,
            "serving_best_composite_b1_tok_s": serving.get("best_composite_b1_tok_s"),
            "serving_best_composite_b8_tok_s": serving.get("best_composite_b8_tok_s"),
            "serving_dense_bf16_b1_tok_s": serving.get("dense_bf16_b1_tok_s"),
            "paged_longctx_bf16_tok_s": serving.get("paged_longctx_2048_b8_bf16_tok_s"),
            "contig_same_protocol_bf16_tok_s": serving.get("contig_same_protocol_bf16_tok_s"),
            "trained_vit_top1_dense": detail.get("trained_vit", {}).get("top1_dense_bf16"),
            "trained_vit_top1_2ssp30": detail.get("trained_vit", {})
                .get("2ssp_curve", {}).get("0.3", {}).get("top1"),
            "trained_llm_int8_ppl_delta_pct": (
                round((detail["trained_llm_small"]["ppl_int8w"] /
                       detail["trained_llm_small"]["ppl_dense_bf16"] - 1) * 100, 3)
                if "trained_llm_small" in detail else None),
            "detail_file": "BENCH_DETAIL.json",
        },
    }
    print(json.dumps(summary))


def _load_recorded_blocks(detail):
    """Attach the committed measurement records (shared by the fresh path
    and the unreachable-TPU fallback)."""
    here = os.path.dirname(os.path.abspath(__file__))
    for name, key in (("bench_pruning_loop_b16.json", "pruning_loop_b16_224"),
                      ("serving_bench.json", "llm_serving"),
                      ("trained_vit_bench.json", "trained_vit"),
                      ("trained_bench_small.json", "trained_llm_small")):
        path = os.path.join(here, "docs", name)
        if os.path.exists(path):
            with open(path) as f:
                detail[key] = json.load(f)


def _report_recorded_fallback():
    """TPU unreachable: quote the last recorded on-chip measurement so the
    round artifact stays meaningful, flagged as not-freshly-measured.
    Must NOT touch the jax backend — every dispatch would block."""
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "docs", "bench_recorded_dense.json")) as f:
        rec = json.load(f)
    detail = {k: rec[k] for k in rec if k != "images_per_sec"}
    detail["tpu_unreachable"] = True
    _load_recorded_blocks(detail)
    detail["pruned50_images_per_sec"] = rec.get("pruned50_images_per_sec")
    _emit(rec["images_per_sec"], detail)


def main():
    # Cold tunnel compiles run ~124 s; a healthy probe fits well inside the
    # default (a CPU backend answers in milliseconds either way).
    if not _device_responsive(
            float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "300"))):
        _report_recorded_fallback()
        return
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    with_pruned = os.environ.get("BENCH_PRUNED", "1") != "0"

    cfg = ViTConfig(num_classes=1000)  # ViT-B/16, 224x224
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    pixels = jax.random.normal(
        jax.random.PRNGKey(1), (batch, cfg.image_size, cfg.image_size, 3), jnp.bfloat16
    )

    def fwd(pixels, params):
        logits, _ = vit_forward(params, pixels, cfg, compute_dtype=jnp.bfloat16)
        return logits

    # Optional profiler capture (set SSP_X_VIT_TRACE_DIR): traces the dense
    # measurement for TensorBoard/Perfetto inspection.
    from ssp_x_vit_tpu.utils.profiling import trace

    with trace():
        ms = measure_latency_scan(fwd, pixels, params, iters=iters)
    img_per_s = batch / (ms / 1e3)

    # Dense ViT-B/16 forward FLOPs per image (s=197 tokens, d=768, 12 blocks:
    # 8sd^2 qkv+proj, 4s^2d attention matmuls, 16sd^2 MLP) — for MFU honesty
    # against both the v5e bf16 peak and the measured tunnel matmul ceiling
    # (docs/tpu_notes.md: 120 TF/s on a bare FFN-shaped matmul pair).
    s, d, L = cfg.seq_len, cfg.hidden_size, cfg.num_layers
    flops_per_img = L * (24 * s * d * d + 4 * s * s * d)
    tf_per_s = flops_per_img * img_per_s / 1e12
    V5E_PEAK_TF = 197.0
    MEASURED_CEILING_TF = 120.0

    # b=1 single-image latency (the reference's own protocol is b=1 MPS).
    pixels_b1 = pixels[:1]
    ms_b1 = measure_latency_scan(fwd, pixels_b1, params, iters=iters)

    detail = {
        "batch": batch,
        "latency_ms_per_batch": round(ms, 3),
        "latency_b1_ms": round(ms_b1, 3),
        "effective_tf_per_s": round(tf_per_s, 1),
        "mfu_vs_peak": round(tf_per_s / V5E_PEAK_TF, 3),
        "mfu_vs_measured_ceiling": round(tf_per_s / MEASURED_CEILING_TF, 3),
        "dtype": "bfloat16",
        "backend": jax.default_backend(),
        "baseline": "reference dense ViT-B/16 b=1 MPS 43.6ms (22.9 img/s)",
    }

    # Committed measurement records: north-star pruning-loop head-to-head
    # (re-running the torch reference takes ~20 min on this 1-core host),
    # LLM serving headlines (each bench is 10-30 min of TPU compiles), and
    # trained-checkpoint accuracy tables (scripts/bench_trained*.py
    # re-measure them) — bench.py quotes the committed JSONs.
    _load_recorded_blocks(detail)

    if with_pruned:
        # 50%-global-sparsity 2SSP-materialized model (plan K/t, weight-L1
        # importance — random weights, architecture is what matters here).
        from ssp_x_vit_tpu.models.vit import vit_forward_materialized
        from ssp_x_vit_tpu.pruning import (
            plan_2ssp_allocation, select_keep_indices, weight_l1_importance,
            materialize_width_pruning, materialize_depth_pruning,
        )
        from ssp_x_vit_tpu.pruning.depth import (
            heuristic_attention_importance, select_attention_blocks_to_prune,
        )

        plan = plan_2ssp_allocation(cfg, 0.5, min_remaining=256)
        width = select_keep_indices(
            weight_l1_importance(params),
            n_to_prune_per_block=[plan.per_block_neurons_to_prune] * cfg.num_layers,
            min_remaining=256, verbose=False)
        p2, c2 = materialize_width_pruning(params, cfg, width.keep_indices)
        blocks = select_attention_blocks_to_prune(
            heuristic_attention_importance(cfg.num_layers), plan.blocks_to_prune)
        p2, c2 = materialize_depth_pruning(p2, c2, blocks)

        def fwd_pruned(pixels, p):
            return vit_forward_materialized(p, pixels, c2, compute_dtype=jnp.bfloat16)

        ms_p = measure_latency_scan(fwd_pruned, pixels, p2, iters=iters)
        detail["pruned50_latency_ms_per_batch"] = round(ms_p, 3)
        detail["pruned50_images_per_sec"] = round(batch / (ms_p / 1e3), 2)
        detail["pruned50_plan"] = {"K": plan.blocks_to_prune,
                                   "t": plan.per_block_neurons_to_prune}

    _emit(round(img_per_s, 2), detail)


if __name__ == "__main__":
    main()
