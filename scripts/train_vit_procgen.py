"""Train a small ViT on the procgen corpus — the ViT path's trained-weights
checkpoint (VERDICT r4 #4: replace random-weight accuracy caveats with real
top-1-vs-sparsity measurements, mirroring the reference's report-*perc.md
protocol on experiments/vit_pruning/reports/).

Pinned-reproducible: fixed seeds for init and the data stream (the corpus is
procedural — the "dataset" IS the seed), fixed step count, cosine schedule.
Images are rendered ON-DEVICE inside the jitted train step (procgen.sample_batch),
so the 1-core host never bottlenecks the TPU and there is no per-step H2D
image traffic.

  python scripts/train_vit_procgen.py                 # TPU, ~2-4 min
  python scripts/train_vit_procgen.py --cpu --steps 30  # smoke

Writes ckpts/vit_procgen/ (committed — the pinned artifact other benches
load) + prints final val top-1. Measured (TPU, seed 0): 1.0000 val top-1 at
the default 20000 steps (~11 min; 0.774 at 2000 — the task needs the full
schedule), recorded in ckpts/vit_procgen/train_meta.json.
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
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--inter", type=int, default=1024)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--patch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--out", default="ckpts/vit_procgen")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from ssp_x_vit_tpu.data.procgen import (NUM_CLASSES, procgen_dataset,
                                            sample_batch)
    from ssp_x_vit_tpu.models.persistence import save_pruned_model
    from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from ssp_x_vit_tpu.pruning.finetune import cross_entropy_loss

    cfg = ViTConfig(image_size=args.img, patch_size=args.patch,
                    hidden_size=args.hidden, num_layers=args.layers,
                    num_heads=args.heads, intermediate_size=args.inter,
                    num_classes=NUM_CLASSES)
    params = init_vit_params(jax.random.PRNGKey(args.seed), cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"params {n_params/1e6:.2f}M backend {jax.default_backend()}",
          flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, args.steps)
    opt = optax.adamw(sched, weight_decay=0.05)
    opt_state = opt.init(params)

    def loss_fn(p, key):
        # images rendered in-graph: the data stream is part of the step.
        # Normalize exactly as DataPipeline.preprocess_batch: [0,1] -> [-1,1]
        pixels, labels = sample_batch(key, args.batch, image_size=args.img)
        px = (pixels * 2.0 - 1.0).astype(jnp.bfloat16)
        # allow_fused_attn=False: the pallas fused-attn block has no JVP
        # rule — training takes the XLA path (differentiable, and at this
        # size the fused kernel would not win anyway).
        logits, _ = vit_forward(p, px, cfg, compute_dtype=jnp.bfloat16,
                                allow_fused_attn=False)
        return cross_entropy_loss(logits, labels)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, key):
        loss, g = jax.value_and_grad(loss_fn)(p, key)
        updates, o = opt.update(g, o, p)
        return optax.apply_updates(p, updates), o, loss

    # fixed held-out set, disjoint seed domain from the training stream;
    # evaluated through the SAME library path every bench uses
    # (DataPipeline.preprocess_batch + evaluation.classify.evaluate_top1)
    from ssp_x_vit_tpu.data.pipeline import DataPipeline
    from ssp_x_vit_tpu.evaluation.classify import evaluate_top1

    val_imgs, val_labels = procgen_dataset(2048, image_size=args.img,
                                           seed=10_000_019)
    val_batches = list(DataPipeline(val_imgs, val_labels, img_size=args.img,
                                    batch_size=256).batches())

    def val_top1(p):
        return evaluate_top1(p, cfg, val_batches)

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if (i + 1) % args.eval_every == 0 or i == 0:
            acc = val_top1(params)
            print(f"[TRAIN-LOG] step={i+1} loss={float(loss):.4f} "
                  f"val_top1={acc:.4f} elapsed={time.time()-t0:.0f}s",
                  flush=True)

    acc = val_top1(params)
    os.makedirs(args.out, exist_ok=True)
    # store f32 params (small model) — benches cast to bf16 themselves
    save_pruned_model(args.out, jax.tree.map(
        lambda a: np.asarray(a, np.float32), params), cfg)
    meta = {"val_top1": round(acc, 4), "steps": args.steps,
            "batch": args.batch, "lr": args.lr, "seed": args.seed,
            "params_M": round(n_params / 1e6, 2),
            "cfg": f"d={cfg.hidden_size} L={cfg.num_layers} "
                   f"H={cfg.num_heads} i={cfg.intermediate_size} "
                   f"img={cfg.image_size} p={cfg.patch_size}",
            "train_time_s": round(time.time() - t0, 1),
            "backend": jax.default_backend()}
    with open(os.path.join(args.out, "train_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
