"""On-chip probe: XLA convert-dot vs pallas quant_matmul (int8/int4).

Decode-shaped matvecs over L=8 STACKED weight matrices inside a lax.scan —
stacking defeats VMEM residency across iterations so every variant pays the
real HBM stream, like a model's layer loop does.

  python scripts/tpu_quant_probe.py [--m 1] [--k 2048] [--n 5632]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--n", type=int, default=5632)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
    from ssp_x_vit_tpu.llm.quant import quantize_weight_int8
    from ssp_x_vit_tpu.ops.pallas.quant_matmul import (
        quant4_matmul, quant_matmul, quantize_weight_int4,
    )

    M, K, N, L = args.m, args.k, args.n, args.layers
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(L, K, N)) * 0.02, jnp.bfloat16)
    wq, s = quantize_weight_int8(w)                       # [L,K,N], [L,N]
    wp4, s4 = jax.vmap(quantize_weight_int4)(w)           # [L,K/2,N], [L,N]
    s = s.astype(jnp.float32)

    def layers_bf16(x, w):
        def body(c, wl):
            return c + 1e-6 * (x @ wl).sum(), None
        return jax.lax.scan(body, jnp.float32(0), w)[0]

    def layers_xla_int8(x, wq, s):
        def body(c, ws):
            wl, sl = ws
            return c + 1e-6 * ((x @ wl.astype(x.dtype)) *
                               sl.astype(x.dtype)).sum(), None
        return jax.lax.scan(body, jnp.float32(0), (wq, s))[0]

    def layers_pl_int8(x, wq, s):
        def body(c, ws):
            wl, sl = ws
            return c + 1e-6 * quant_matmul(x, wl, sl).sum(), None
        return jax.lax.scan(body, jnp.float32(0), (wq, s))[0]

    def make_layers_pl_int4(unpack):
        def layers_pl_int4(x, wp, s):
            def body(c, ws):
                wl, sl = ws
                return c + 1e-6 * quant4_matmul(x, wl, sl, unpack=unpack).sum(), None
            return jax.lax.scan(body, jnp.float32(0), (wp, s))[0]
        return layers_pl_int4

    res = {"m": M, "k": K, "n": N, "layers": L,
           "backend": jax.default_backend()}
    gib = {"bf16": L * K * N * 2, "int8": L * K * N, "int4": L * K * N // 2}

    for tag, fn, a in [
        ("bf16_xla", layers_bf16, (x, w)),
        ("int8_xla", layers_xla_int8, (x, wq, s)),
        ("int8_pallas", layers_pl_int8, (x, wq, s)),
        ("int4_pallas", make_layers_pl_int4("int32"), (x, wp4, s4)),
        ("int4_pallas_float", make_layers_pl_int4("float"), (x, wp4, s4)),
        ("int4_pallas_split", make_layers_pl_int4("split"), (x, wp4, s4)),
    ]:
        try:
            ms = measure_latency_scan(fn, *a, iters=args.iters)
            bw = gib[tag.split("_")[0]] / (ms / 1e3) / 2**30
            res[tag + "_ms"] = round(ms, 4)
            res[tag + "_gibs"] = round(bw, 1)
        except Exception as e:  # noqa: BLE001 — probe reports, never dies
            res[tag + "_error"] = str(e)[:300]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
