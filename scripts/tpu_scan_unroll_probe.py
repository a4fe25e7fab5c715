"""Layer-scan step overhead at m=1 decode: scan vs unrolled (round 5).

The decode attribution (scripts/tpu_decode_attrib.py, post perturb fix)
showed isolated per-group probes SUM to 7.7 ms against a measured 2.98 ms
full step, with a zero-traffic norms probe costing 0.897 ms — i.e. the
m=1 probes are dominated by a ~56 us/scan-step fixed cost, not bandwidth.
This probes whether `lax.scan(..., unroll=k)` over the layer axis removes
that cost (XLA can then software-pipeline weight DMA across layer
boundaries), which would justify an unroll knob on the serving decode's
layer scan.

  python scripts/tpu_scan_unroll_probe.py [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--f", type=int, default=5632)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan

    D, F, L = args.d, args.f, args.layers
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, D)), jnp.bfloat16)
    w_gu = jnp.asarray(rng.normal(size=(L, 2, D, F)) * 0.02, jnp.bfloat16)
    w_down = jnp.asarray(rng.normal(size=(L, F, D)) * 0.02, jnp.bfloat16)
    gb = L * 3 * D * F * 2 / 1e9

    def body(c, gu, d):
        h = jax.nn.silu(c @ gu[0]) * (c @ gu[1])
        return jnp.tanh(h @ d) * 0.5 + c * 0.5

    def mlp_scan(x, wg, wd, unroll):
        def step(c, ws):
            gu, d = ws
            return body(c, gu, d), None
        return jax.lax.scan(step, x, (wg, wd), unroll=unroll)[0]

    def mlp_unrolled(x, wg, wd):
        c = x
        for i in range(L):
            c = body(c, wg[i], wd[i])
        return c

    res = {}
    for name, fn in [
        ("scan_u1", lambda a, b, c: mlp_scan(a, b, c, 1)),
        ("scan_u4", lambda a, b, c: mlp_scan(a, b, c, 4)),
        ("scan_uL", lambda a, b, c: mlp_scan(a, b, c, L)),
        ("python_unroll", mlp_unrolled),
    ]:
        ms = measure_latency_scan(fn, x, w_gu, w_down, iters=args.iters,
                                  perturb_argnums=(0,))
        res[name] = {"ms": round(ms, 4), "gb_s": round(gb / (ms / 1e3), 1)}
        print(f"{name:>14}: {ms:7.3f} ms  {gb/(ms/1e3):6.1f} GB/s", flush=True)

    res["backend"] = jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
