"""On-chip ViT token-pruning benchmark: dense ViT-B/16 b=256 bf16 vs an
EViT-style keep schedule (prune at depths 3/6/9 to ~70% per stage), and the
composition with a 50%-width-pruned architecture. Token pruning attacks the
TOKEN axis (attention quadratic, FFN linear), weight pruning the WIDTH/DEPTH
axes — the speedups should compound.

  python scripts/bench_token_pruning.py
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
    from ssp_x_vit_tpu.models.token_pruning import vit_forward_token_pruned
    from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    cfg = ViTConfig(num_classes=1000)  # ViT-B/16 @ 224, s=197
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    pixels = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, cfg.image_size, cfg.image_size, 3),
                               jnp.bfloat16)
    # EViT-ish: ~0.7 keep rate at depths 3/6/9 (197 -> 139 -> 99 -> 71)
    schedule = ((3, 139), (6, 99), (9, 71))
    results = {"batch": batch, "schedule": [list(p) for p in schedule],
               "backend": jax.default_backend()}

    def bench(name, fn, p):
        # params ride as a traced argument (closed-over device arrays hang
        # jit lowering on the tunneled chip — docs/tpu_notes.md)
        ms = measure_latency_scan(fn, pixels, p, iters=iters)
        results[name] = {"ms": round(ms, 2),
                         "img_per_s": round(batch / (ms / 1e3), 1)}
        print(f"{name:>22}: {ms:7.2f} ms = {batch / (ms / 1e3):7.1f} img/s",
              flush=True)

    bench("dense", lambda px, p: vit_forward(
        p, px, cfg, compute_dtype=jnp.bfloat16)[0], params)
    bench("token_pruned", lambda px, p: vit_forward_token_pruned(
        p, px, cfg, schedule, compute_dtype=jnp.bfloat16), params)

    # composition with 2SSP width pruning (50% of FFN neurons kept)
    from ssp_x_vit_tpu.pruning.width import materialize_width_pruning

    keeps = [np.arange(cfg.intermediate_size // 2)
             for _ in range(cfg.num_layers)]
    wp, wcfg = materialize_width_pruning(params, cfg, keeps)
    bench("width_pruned", lambda px, p: vit_forward(
        p, px, wcfg, compute_dtype=jnp.bfloat16)[0], wp)
    bench("width+token_pruned", lambda px, p: vit_forward_token_pruned(
        p, px, wcfg, schedule, compute_dtype=jnp.bfloat16), wp)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
