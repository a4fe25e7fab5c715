"""On-chip head-to-head: fused attention-block kernel vs the XLA branch.

Measures the FULL attention residual branch (LN1 + fused-QKV + attention +
out-proj + residual add) at ViT-B production dims (b=256, s=197, d=768, 12
heads, bf16) with the in-graph scan harness (host-side timing is unreliable
over the tunnel, docs/tpu_notes.md). This is the VERDICT r1 #4 experiment:
the per-op pallas attention loses to XLA at ViT lengths; the fused branch
kernel is the remaining untried idea. The result (win or loss) sets
ops.dispatch.FUSED_ATTN_BLOCK_ENABLED and is recorded in docs/tpu_notes.md.

Usage: python scripts/bench_fused_attn_block.py [--batch 256] [--iters 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=197)
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
    from ssp_x_vit_tpu.ops.attention import multi_head_attention
    from ssp_x_vit_tpu.ops.common import layer_norm
    from ssp_x_vit_tpu.ops.pallas.fused_attn_block import fused_attn_block

    dtype = jnp.dtype(args.dtype)
    b, s, d, heads = args.batch, args.seq, args.hidden, args.heads
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(b, s, d)) * 0.02, dtype)
    lns = jnp.asarray(1.0 + 0.02 * rng.normal(size=(d,)), dtype)
    lnb = jnp.asarray(0.02 * rng.normal(size=(d,)), dtype)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.02, dtype)
    bqkv = jnp.asarray(rng.normal(size=(3 * d,)) * 0.02, dtype)
    wproj = jnp.asarray(rng.normal(size=(d, d)) * 0.02, dtype)
    bproj = jnp.asarray(rng.normal(size=(d,)) * 0.02, dtype)

    def xla_branch(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        h = layer_norm(x, lns, lnb, 1e-12)
        return x + multi_head_attention(h, wqkv, bqkv, wproj, bproj, heads,
                                        use_flash=False)

    def fused_branch(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        return fused_attn_block(x, lns, lnb, wqkv, bqkv, wproj, bproj, heads,
                                eps=1e-12)

    operands = (x, lns, lnb, wqkv, bqkv, wproj, bproj)

    # correctness first (on-chip): compare through an XLA epilogue (raw pallas
    # outputs cannot be host-fetched over the tunnel)
    @jax.jit
    def diff(*a):
        return jnp.max(jnp.abs(xla_branch(*a).astype(jnp.float32)
                               - fused_branch(*a).astype(jnp.float32)))

    print(f"max |xla - fused| = {float(diff(*operands)):.2e}", flush=True)

    t_xla = measure_latency_scan(xla_branch, *operands, iters=args.iters)
    print(f"xla_branch   : {t_xla:.3f} ms", flush=True)
    t_fused = measure_latency_scan(fused_branch, *operands, iters=args.iters)
    print(f"fused_branch : {t_fused:.3f} ms", flush=True)
    flops = 2 * b * s * d * 4 * d + 4 * b * heads * s * s * (d // heads)
    print(f"[RESULT] b={b} s={s} d={d} heads={heads} dtype={args.dtype} "
          f"xla={t_xla:.3f}ms fused={t_fused:.3f}ms "
          f"speedup={t_xla / t_fused:.2f}x "
          f"fused_tf={flops / t_fused / 1e9:.1f}TF/s")


if __name__ == "__main__":
    main()
