"""Smoke-test the Pallas kernels on the real TPU chip vs the jnp reference.

Run directly (no pytest): python scripts/tpu_smoke.py

Note: on the tunneled axon TPU, direct host-fetch of a buffer produced by a
pallas kernel can hang; all comparisons here go through XLA reductions before
transfer.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.ops.attention import sdpa_reference
from ssp_x_vit_tpu.ops.ffn import ffn_forward


def check(name, a, b, tol):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    status = "OK " if err < tol else "FAIL"
    print(f"[{status}] {name}: max_abs_err={err:.3e} (tol {tol})")
    return err < tol


def main():
    print("backend:", jax.default_backend())
    assert jax.default_backend() == "tpu", "run on the TPU chip"
    ok = True

    from ssp_x_vit_tpu.ops.pallas.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    for (b, h, s, hd, dtype, tol) in [
        (8, 12, 197, 64, jnp.float32, 5e-3),  # TPU matmuls use bf16 MXU passes at default precision
        (8, 12, 197, 64, jnp.bfloat16, 2e-2),
        (1, 8, 2048, 64, jnp.bfloat16, 2e-2),
    ]:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, h, s, hd), dtype)
        k = jax.random.normal(ks[1], (b, h, s, hd), dtype)
        v = jax.random.normal(ks[2], (b, h, s, hd), dtype)
        ref = jax.jit(lambda q, k, v: sdpa_reference(q, k, v))(q, k, v)
        out = jax.jit(lambda q, k, v: flash_attention(q, k, v))(q, k, v)
        ok &= check(f"flash_attn {dtype.__name__} b{b} s{s}", out, ref, tol)

        t_ref = _bench(jax.jit(lambda q, k, v: sdpa_reference(q, k, v)), q, k, v)
        t_fa = _bench(jax.jit(lambda q, k, v: flash_attention(q, k, v)), q, k, v)
        print(f"       latency: sdpa={t_ref*1e3:.3f}ms flash={t_fa*1e3:.3f}ms")

    from ssp_x_vit_tpu.ops.pallas.fused_ffn import fused_ffn

    for (b, s, d, f, dtype, tol) in [
        (8, 197, 768, 3072, jnp.float32, 2e-3),
        (8, 197, 768, 3072, jnp.bfloat16, 5e-1),
    ]:
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (b, s, d), dtype)
        w1 = jax.random.normal(ks[1], (d, f), dtype) * 0.03
        b1 = jax.random.normal(ks[2], (f,), dtype) * 0.03
        w2 = jax.random.normal(ks[3], (f, d), dtype) * 0.03
        b2 = jax.random.normal(ks[4], (d,), dtype) * 0.03

        ref_fn = jax.jit(lambda *a: ffn_forward(*a, collect_stats=True, use_pallas_kernel=False))
        pal_fn = jax.jit(lambda *a: ffn_forward(*a, collect_stats=True, use_pallas_kernel=True))
        ro, rs = ref_fn(x, w1, b1, w2, b2)
        po, ps = pal_fn(x, w1, b1, w2, b2)
        ok &= check(f"fused_ffn out {dtype.__name__}", po, ro, tol)
        ok &= check(f"fused_ffn stats {dtype.__name__}", ps, rs, max(tol * 100, 1.0))

        t_ref = _bench(ref_fn, x, w1, b1, w2, b2)
        t_pal = _bench(pal_fn, x, w1, b1, w2, b2)
        print(f"       latency: jnp={t_ref*1e3:.3f}ms pallas={t_pal*1e3:.3f}ms")

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


def _bench(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    main()
