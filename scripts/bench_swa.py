"""On-chip A/B for sliding-window attention (mistral band masks).

Three measurements:
1. Forward kernels at long context (default b=1, h=32, hkv=8, s=8192,
   hd=128, bf16, window=4096 — mistral-7B shapes scaled to one chip):
   full-causal flash vs windowed flash (resident band mask) vs windowed
   streaming (out-of-band k-blocks predicated off — the O(s*window) path).
   This measures the PROVISIONAL `window + 2*BLOCK_KS` dispatch point
   (ops/pallas/flash_attention.py) so docs/tpu_notes.md can record the real
   resident-vs-streaming crossover.
2. Training step: fwd+bwd through flash at the same shapes (streaming
   backward band predication).
3. Serving: rolling window-bounded cache vs contiguous cache at a long
   generation (cache bytes scale with window vs max_len; reports tok/s and
   cache sizes).

Usage: python scripts/bench_swa.py   (BENCH_* env overrides as elsewhere)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
from ssp_x_vit_tpu.ops.pallas import flash_attention as fa


def bench_kernels(results, iters):
    b, h, s, hd = (int(os.environ.get(k, d)) for k, d in
                   (("BENCH_B", 1), ("BENCH_H", 32), ("BENCH_S", 8192),
                    ("BENCH_HD", 128)))
    hkv = int(os.environ.get("BENCH_HKV", 8))
    window = int(os.environ.get("BENCH_WINDOW", 4096))
    print(f"kernels: b={b} h={h} hkv={hkv} s={s} hd={hd} window={window}",
          flush=True)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, hd), jnp.bfloat16)

    def run(name, fn):
        ms = measure_latency_scan(fn, q, k, v, iters=iters)
        results[name] = round(ms, 3)
        print(f"{name:>24}: {ms:8.3f} ms", flush=True)

    run("causal_full", lambda q_, k_, v_: fa.flash_attention(
        q_, k_, v_, causal=True))
    # resident kernel with the band mask, forced (bypasses dispatch) — the
    # A/B that measures the provisional `window + 2*BLOCK_KS` switch point
    run("window_resident", lambda q_, k_, v_: _resident(q_, k_, v_, window))
    run("window_streaming", lambda q_, k_, v_: fa._flash_forward_streaming(
        q_, k_, v_, causal=True, window=window))
    run("window_dispatch", lambda q_, k_, v_: fa.flash_attention(
        q_, k_, v_, causal=True, window=window))

    # fwd+bwd at the same shapes
    def loss(fn):
        def f(q_, k_, v_):
            g = jax.grad(lambda a, b_, c: jnp.sum(
                fn(a, b_, c).astype(jnp.float32)), argnums=(0, 1, 2))(q_, k_, v_)
            return g[0]
        return f

    run("causal_full_fwdbwd", loss(lambda a, b_, c: fa.flash_attention(
        a, b_, c, causal=True)))
    run("window_fwdbwd", loss(lambda a, b_, c: fa.flash_attention(
        a, b_, c, causal=True, window=window)))


def _resident(q, k, v, window):
    """Resident q-tiled kernel with the band mask, regardless of dispatch."""
    b, h, s, hd = q.shape
    hkv = k.shape[1]
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scale = 1.0 / hd**0.5
    s_pad = -(-s // fa.BLOCK_Q) * fa.BLOCK_Q
    rep = h // hkv
    qf = q.reshape(b * hkv, rep, s, hd)
    kf = k.reshape(b * hkv, s, hd)
    vf = v.reshape(b * hkv, s, hd)
    q_spec = pl.BlockSpec((1, 1, fa.BLOCK_Q, hd),
                          lambda bh, r, iq: (bh, r, iq, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s_pad, hd), lambda bh, r, iq: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(fa._flash_kernel, scale=scale, seq_len=s,
                          causal=True, window=window),
        grid=(b * hkv, rep, s_pad // fa.BLOCK_Q),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * hkv, rep, s_pad, hd), q.dtype),
    )(qf, kf, vf).reshape(b, h, s, hd)


def bench_rolling(results):
    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    import time

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=4, intermediate_size=5632,
                      model_type="mistral", sliding_window=1024)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    prompt = np.arange(128, dtype=np.int32) % 31000 + 1
    max_length = int(os.environ.get("BENCH_GEN_LEN", 2048))

    def run(name, rolling):
        # warm (compile) then time one full generation
        generate_kv_scan(params, cfg, prompt, max_length=max_length,
                         rolling=rolling)
        t0 = time.perf_counter()
        out = generate_kv_scan(params, cfg, prompt, max_length=max_length,
                               rolling=rolling)
        secs = time.perf_counter() - t0
        toks = max_length - len(prompt)
        cache_tokens = cfg.sliding_window if rolling else max_length
        gib = (2 * cfg.num_layers * cache_tokens * cfg.num_kv_heads *
               cfg.head_dim * 2) / 2**30
        results[name] = {"tok_s": round(toks / secs, 1),
                         "cache_gib_b1": round(gib, 3)}
        print(f"{name:>24}: {toks / secs:8.1f} tok/s  cache {gib:.3f} GiB",
              flush=True)
        return out

    a = run("serve_contiguous", False)
    b = run("serve_rolling", True)
    results["rolling_exact"] = bool(np.array_equal(np.asarray(a), np.asarray(b)))


def main():
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    print(f"backend={jax.default_backend()}", flush=True)
    results = {}
    bench_kernels(results, iters)
    if os.environ.get("BENCH_SKIP_SERVE") != "1":
        bench_rolling(results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
