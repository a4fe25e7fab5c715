"""Per-op attribution of the b=1 decode step (VERDICT r4 #7).

bench_quant measured dense b=1 decode at 335 tok/s bf16 / 528 int8 —
streaming 595 / 501 GB/s of the ~819 GB/s v5e HBM peak. This script times
each weight-stream component of one decode step IN ISOLATION (stacked-
weights lax.scan over layers, float operand perturbed by the carry so
nothing hoists — the evaluation.latency harness), then compares the sum
against the measured full step, to attribute the remaining gap between
{matmul bandwidth, attention-over-cache, non-matmul epilogues, scan/step
overhead} — the floor argument (or target list) for a fused decode kernel.

Groups per step (953M default: d=2048, f=5632, L=16, V=32000, cache 512):
  qkvo       4 [d,d] dots x L          536 MB bf16 / 268 int8
  mlp        gate/up/silu/down x L    1106 MB bf16 / 553 int8
  attn_cache einsum over [S,d] k+v    67 MB (S=512)
  lm_head    [d,V] dot                131 MB bf16 / 66 int8
  norms      2L+1 rmsnorms + rope     ~0 MB (overhead probe)

  python scripts/tpu_decode_attrib.py [--cache 512] [--cpu]

Prints per-group ms + achieved GB/s + the attribution table vs the measured
full-step ms (pass --full-ms from scripts/bench_serve.py, default the
recorded 2.98 bf16 / 1.89 int8).
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
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--cache", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--full-ms-bf16", type=float, default=2.98,
                    help="measured full decode step (bench_serve 335.2 tok/s)")
    ap.add_argument("--full-ms-int8", type=float, default=1.89)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
    from ssp_x_vit_tpu.llm.quant import quantize_weight_int8

    D, F, L, V, H, S = (args.d, args.f, args.layers, args.vocab, args.heads,
                        args.cache)
    hd = D // H
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, D)), jnp.bfloat16)

    def stacked(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.02, jnp.bfloat16)

    w_qkvo = stacked(L, 4, D, D)
    w_gu = stacked(L, 2, D, F)
    w_down = stacked(L, F, D)
    w_head = stacked(D, V)
    ck = stacked(L, 1, S, H, hd)
    cv = stacked(L, 1, S, H, hd)

    q8 = lambda w: quantize_weight_int8(w)  # noqa: E731

    res = {"cfg": f"d={D} f={F} L={L} V={V} cache={S}",
           "backend": None, "groups": {}}

    def probe(name, fn, *arrs, bytes_per_iter):
        # perturb only arg 0 (the [1, D] activation): perturbing the stacked
        # weights would add a full read+write pass over them per iteration,
        # inflating weight-bound probes ~3x (measured) — one carry-dependent
        # input already defeats hoisting.
        ms = measure_latency_scan(fn, *arrs, iters=args.iters,
                                  perturb_argnums=(0,))
        gbs = bytes_per_iter / (ms / 1e3) / 1e9
        res["groups"][name] = {"ms": round(ms, 4), "gb": round(
            bytes_per_iter / 1e9, 3), "gb_s": round(gbs, 1)}
        print(f"{name:>16}: {ms:7.3f} ms  {bytes_per_iter/1e9:6.3f} GB  "
              f"{gbs:6.1f} GB/s", flush=True)
        return ms

    import jax.numpy as _j

    # --- bf16 groups --------------------------------------------------------
    def qkvo(x, w):
        def body(c, wl):
            h = c
            for i in range(4):
                h = _j.tanh(h @ wl[i]) * 0.5 + c * 0.5
            return h, None
        return jax.lax.scan(body, x, w)[0]

    probe("qkvo_bf16", qkvo, x, w_qkvo,
          bytes_per_iter=L * 4 * D * D * 2)

    def mlp(x, wg, wd):
        def body(c, ws):
            gu, d = ws
            h = jax.nn.silu(c @ gu[0]) * (c @ gu[1])
            return _j.tanh(h @ d) * 0.5 + c * 0.5, None
        return jax.lax.scan(body, x, (wg, wd))[0]

    probe("mlp_bf16", mlp, x, w_gu, w_down,
          bytes_per_iter=L * 3 * D * F * 2)

    def attn_cache(x, ck, cv):
        q = x.reshape(1, H, 1, hd)

        def body(c, kv):
            k, v = kv  # [1, S, H, hd]
            lg = _j.einsum("bhqd,bshd->bhqs", c, k.astype(c.dtype))
            p = jax.nn.softmax(lg.astype(_j.float32), axis=-1).astype(c.dtype)
            o = _j.einsum("bhqs,bshd->bhqd", p, v.astype(c.dtype))
            return _j.tanh(o) * 0.5 + c * 0.5, None

        return jax.lax.scan(body, q, (ck, cv))[0]

    probe("attn_cache_bf16", attn_cache, x, ck, cv,
          bytes_per_iter=L * 2 * S * D * 2)

    probe("lm_head_bf16", lambda x, w: _j.tanh(x @ w).sum(), x, w_head,
          bytes_per_iter=D * V * 2)

    def norms(x):
        def body(c, _):
            for _ in range(2):
                c = c * jax.lax.rsqrt(_j.mean(c * c, -1, keepdims=True) + 1e-6)
            return c, None
        return jax.lax.scan(body, x, None, length=L)[0]

    probe("norms", norms, x, bytes_per_iter=1)

    # --- int8 groups --------------------------------------------------------
    wq_qkvo, s_qkvo = q8(w_qkvo)
    wq_gu, s_gu = q8(w_gu)
    wq_down, s_down = q8(w_down)
    wq_head, s_head = q8(w_head)

    def qkvo8(x, w, s):
        def body(c, ws):
            wl, sl = ws
            h = c
            for i in range(4):
                h = _j.tanh((h @ wl[i].astype(c.dtype)) *
                            sl[i].astype(c.dtype)) * 0.5 + c * 0.5
            return h, None
        return jax.lax.scan(body, x, (w, s))[0]

    probe("qkvo_int8", qkvo8, x, wq_qkvo, s_qkvo.astype(jnp.float32),
          bytes_per_iter=L * 4 * D * D)

    def mlp8(x, wg, sg, wd, sd):
        def body(c, ws):
            gu, sgu, d, sdl = ws
            g = (c @ gu[0].astype(c.dtype)) * sgu[0].astype(c.dtype)
            u = (c @ gu[1].astype(c.dtype)) * sgu[1].astype(c.dtype)
            h = jax.nn.silu(g) * u
            return _j.tanh((h @ d.astype(c.dtype)) *
                           sdl.astype(c.dtype)) * 0.5 + c * 0.5, None
        return jax.lax.scan(body, x, (wg, sg, wd, sd))[0]

    probe("mlp_int8", mlp8, x, wq_gu, s_gu.astype(jnp.float32),
          wq_down, s_down.astype(jnp.float32),
          bytes_per_iter=L * 3 * D * F)

    probe("lm_head_int8",
          lambda x, w, s: _j.tanh((x @ w.astype(x.dtype)) *
                                  s.astype(x.dtype)).sum(),
          x, wq_head, s_head.astype(jnp.float32),
          bytes_per_iter=D * V)

    # --- attribution table --------------------------------------------------
    g = res["groups"]
    for tag, full in (("bf16", args.full_ms_bf16), ("int8", args.full_ms_int8)):
        parts = (g[f"qkvo_{tag}"]["ms"] + g[f"mlp_{tag}"]["ms"] +
                 g["attn_cache_bf16"]["ms"] + g[f"lm_head_{tag}"]["ms"] +
                 g["norms"]["ms"])
        res[f"sum_parts_ms_{tag}"] = round(parts, 3)
        res[f"full_ms_{tag}"] = full
        res[f"unattributed_ms_{tag}"] = round(full - parts, 3)
        total_gb = (g[f"qkvo_{tag}"]["gb"] + g[f"mlp_{tag}"]["gb"] +
                    g["attn_cache_bf16"]["gb"] + g[f"lm_head_{tag}"]["gb"])
        res[f"step_gb_{tag}"] = round(total_gb, 3)
        res[f"parts_gb_s_{tag}"] = round(total_gb / (parts / 1e3) / 1e9 * 1e9, 1)
        print(f"[{tag}] parts {parts:.3f} ms vs full {full:.3f} ms -> "
              f"unattributed {full-parts:.3f} ms; parts stream "
              f"{res[f'parts_gb_s_{tag}']} GB/s", flush=True)

    import jax as _jax

    res["backend"] = _jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
