"""Smoke + timing for the pallas paged-attention kernel on the TPU chip
vs the jnp gather reference. Run: python scripts/tpu_paged_smoke.py

Comparisons go through XLA reductions before transfer (tunnel quirk,
docs/tpu_notes.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.ops.pallas.paged_attention import (
    _paged_pallas_perhead, paged_attention_pallas, paged_attention_reference,
)


def _bench(fn, *args, iters=20):
    fn(*args)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # scalar barrier
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    assert jax.default_backend() == "tpu", "run on the TPU chip"
    ok = True
    rng = np.random.default_rng(0)

    # (b, nq, nkv, hd, ps, mp, P): decode-serving shapes (953M-class: 16 q
    # heads, 16 kv, hd 64; and a 7B-class GQA shape: 32q/8kv hd 128)
    for (b, nq, nkv, hd, ps, mp, P, dtype, tol) in [
        (8, 16, 16, 64, 64, 8, 128, jnp.bfloat16, 2e-2),
        (8, 32, 8, 128, 64, 16, 256, jnp.bfloat16, 2e-2),
        (1, 16, 16, 64, 64, 32, 64, jnp.bfloat16, 2e-2),
    ]:
        q = jnp.asarray(rng.normal(size=(b, nq, hd)), dtype)
        kp = jnp.asarray(rng.normal(size=(nkv, P, ps, hd)), dtype)
        vp = jnp.asarray(rng.normal(size=(nkv, P, ps, hd)), dtype)
        pt = jnp.asarray(rng.permutation(P - 1)[: b * mp].reshape(b, mp) + 1
                         if (P - 1) >= b * mp else
                         rng.integers(1, P, size=(b, mp)), jnp.int32)
        lens = jnp.asarray(rng.integers(ps, mp * ps, size=(b,)), jnp.int32)

        ref = jax.jit(paged_attention_reference)(q, kp, vp, pt, lens)
        for name, fn in (("grouped", paged_attention_pallas),
                         ("perhead", _paged_pallas_perhead)):
            out = jax.jit(fn)(q, kp, vp, pt, lens)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            status = "OK " if err < tol else "FAIL"
            ok &= err < tol
            print(f"[{status}] paged/{name} b{b} nq{nq}/{nkv} hd{hd} ps{ps} mp{mp}: "
                  f"max_abs_err={err:.3e}")
        t_ref = _bench(jax.jit(paged_attention_reference), q, kp, vp, pt, lens)
        t_g = _bench(jax.jit(paged_attention_pallas), q, kp, vp, pt, lens)
        t_p = _bench(jax.jit(_paged_pallas_perhead), q, kp, vp, pt, lens)
        print(f"       latency: gather-ref={t_ref*1e3:.3f}ms grouped={t_g*1e3:.3f}ms "
              f"perhead={t_p*1e3:.3f}ms")

    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
