"""Trained-ViT accuracy measurements: real top-1 vs sparsity (VERDICT r4 #4).

The reference's only committed benchmark table is ViT top-1 vs sparsity on a
trained checkpoint (experiments/vit_pruning/reports/report-*perc.md, protocol
src/vit_pruning.py:326-373). This is that table measured on OUR trained
checkpoint (scripts/train_vit_procgen.py on the procgen corpus — CIFAR-10 +
pretrained ViT-B are egress-blocked), replacing every "per the papers
(unmeasurable offline)" accuracy claim:

1. 2SSP top-1 at the reference's sparsity rows (2/5/10/15/20/30/40/50%),
   width+depth (copy-mode stage-2, the reference protocol);
2. depth-only variants (the reference's "v2" rows, forced K);
3. EViT-style token pruning (accuracy side of bench_token_pruning.py);
4. int8 weight-only and W8A8 quantized top-1.

  python scripts/bench_trained_vit.py [--ckpt ckpts/vit_procgen] [--cpu]

Writes docs/trained_vit_bench.json and prints one compact JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/vit_procgen")
    ap.add_argument("--eval-images", type=int, default=2048)
    ap.add_argument("--calib-images", type=int, default=64)
    ap.add_argument("--rates", default="0.02,0.05,0.10,0.15,0.20,0.30,0.40,0.50")
    ap.add_argument("--out", default="docs/trained_vit_bench.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ssp_x_vit_tpu.data.pipeline import DataPipeline
    from ssp_x_vit_tpu.data.procgen import procgen_dataset
    from ssp_x_vit_tpu.evaluation.classify import evaluate_top1
    from ssp_x_vit_tpu.models.persistence import load_pruned_model
    from ssp_x_vit_tpu.models.quant import quantize_vit_params_int8
    from ssp_x_vit_tpu.pruning import (compute_actual_sparsity,
                                       count_total_params, two_ssp_prune_vit)

    params, cfg = load_pruned_model(args.ckpt, dtype=jnp.bfloat16)
    img = cfg.image_size

    # same held-out seed domain as train_vit_procgen's val set; calibration
    # from the training stream's domain (reference calibrates on train,
    # evaluates on test — src/main.py:48-61)
    val_imgs, val_labels = procgen_dataset(args.eval_images, image_size=img,
                                           seed=10_000_019)
    cal_imgs, cal_labels = procgen_dataset(args.calib_images, image_size=img,
                                           seed=77)
    test = list(DataPipeline(val_imgs, val_labels, img_size=img,
                             batch_size=256).batches())
    calib = list(DataPipeline(cal_imgs, cal_labels, img_size=img,
                              batch_size=32).batches())

    p0 = count_total_params(cfg)
    res = {"ckpt": args.ckpt, "backend": jax.default_backend(),
           "eval_images": args.eval_images,
           "params_M_dense": round(p0 / 1e6, 3)}

    t0 = time.time()
    res["top1_dense_bf16"] = round(evaluate_top1(params, cfg, test), 4)
    print(f"dense top-1 {res['top1_dense_bf16']} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # --- quantization ------------------------------------------------------
    q8 = quantize_vit_params_int8(params, cfg)
    res["top1_int8w"] = round(evaluate_top1(q8, cfg, test), 4)
    from ssp_x_vit_tpu.ops import dispatch

    dispatch.set_w8a8_enabled(True)
    try:
        jax.clear_caches()
        res["top1_int8_w8a8"] = round(evaluate_top1(q8, cfg, test), 4)
    finally:
        dispatch.set_w8a8_enabled(False)
        jax.clear_caches()
    print(f"quant top-1 int8 {res['top1_int8w']} w8a8 {res['top1_int8_w8a8']}",
          flush=True)

    # --- EViT token pruning (static CLS-attention schedule) ----------------
    L, s = cfg.num_layers, cfg.seq_len
    sched = []
    kept = s
    for frac in (0.3, 0.6, 0.8):
        kept = max(8, int(round(kept * 0.7)))
        sched.append((int(round(L * frac)), kept))
    res["token_pruning_schedule"] = [list(p) for p in sched]
    res["top1_token_pruned"] = round(
        evaluate_top1(params, cfg, test, token_keep_schedule=tuple(sched)), 4)
    print(f"token-pruned top-1 {res['top1_token_pruned']} "
          f"(schedule {sched})", flush=True)

    # --- 2SSP top-1 vs sparsity (reference report-*perc rows) --------------
    curve = {}
    for rate in [float(r) for r in args.rates.split(",")]:
        p2, c2, info = two_ssp_prune_vit(
            params, cfg, rate, calibration_batches=calib, eval_batches=test,
            importance_mode="copy", batch_limit=2, min_remaining=32)
        sp = compute_actual_sparsity(p0, count_total_params(c2))
        curve[f"{rate:g}"] = {
            "top1": round(evaluate_top1(p2, c2, test), 4),
            "achieved_sparsity": round(sp, 4),
            "params_M": round(count_total_params(c2) / 1e6, 3),
            "K": info.plan.blocks_to_prune,
            "t": info.plan.per_block_neurons_to_prune,
            "pruned_blocks": list(info.pruned_attention_blocks),
        }
        print(f"2ssp@{rate:g}: top1 {curve[f'{rate:g}']['top1']} "
              f"K={info.plan.blocks_to_prune} "
              f"t={info.plan.per_block_neurons_to_prune}", flush=True)
    res["2ssp_curve"] = curve

    # --- depth-only "v2" rows (reference report-15v2/30percv2: forced K) ---
    v2 = {}
    for k in (2, 4):
        p2, c2, info = two_ssp_prune_vit(
            params, cfg, 0.15 if k == 2 else 0.30, calibration_batches=calib,
            eval_batches=test, importance_mode="copy", batch_limit=2,
            min_remaining=32, forced_blocks=k, stage="s2")
        sp = compute_actual_sparsity(p0, count_total_params(c2))
        v2[f"K{k}"] = {
            "top1": round(evaluate_top1(p2, c2, test), 4),
            "achieved_sparsity": round(sp, 4),
            "pruned_blocks": list(info.pruned_attention_blocks),
        }
        print(f"depth-only K={k}: top1 {v2[f'K{k}']['top1']}", flush=True)
    res["depth_only"] = v2

    res["elapsed_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
