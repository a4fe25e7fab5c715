"""On-chip A/B of the fused attention-block kernels inside the FULL dense
ViT-B/16 b=256 bf16 forward (v1 per-head matmuls vs v2 full-MXU projections
vs XLA branch). Run after scripts/tpu_profile_vit.py established the
attribution baseline."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
import ssp_x_vit_tpu.ops.pallas.fused_attn_block as fab


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    cfg = ViTConfig(num_classes=1000)
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    pixels = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, 224, 224, 3), jnp.bfloat16)

    def fwd(pixels, params):
        logits, _ = vit_forward(params, pixels, cfg, compute_dtype=jnp.bfloat16)
        return logits

    def fwd_xla(pixels, params):
        logits, _ = vit_forward(params, pixels, cfg, compute_dtype=jnp.bfloat16,
                                allow_fused_attn=False)
        return logits

    results = {}
    v1 = fab.fused_attn_block

    def bench(name, fn):
        ms = measure_latency_scan(fn, pixels, params, iters=iters)
        results[name] = round(ms, 2)
        print(f"{name:>10}: {ms:8.2f} ms/batch  ({batch / (ms / 1e3):7.1f} img/s)",
              flush=True)

    bench("v1", fwd)
    fab.fused_attn_block = lambda *a, **kw: fab.fused_attn_block_v2(*a, **kw)
    try:
        bench("v2", fwd)
    finally:
        fab.fused_attn_block = v1
    bench("xla", fwd_xla)

    # numerical check: v2 vs v1 logits on a small slice (same program family)
    small = pixels[:8]
    l1 = np.asarray(jax.jit(fwd)(small, params), np.float32)
    fab.fused_attn_block = lambda *a, **kw: fab.fused_attn_block_v2(*a, **kw)
    try:
        l2 = np.asarray(jax.jit(fwd)(small, params), np.float32)
    finally:
        fab.fused_attn_block = v1
    results["max_abs_logit_diff_v1_v2"] = float(np.abs(l1 - l2).max())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
