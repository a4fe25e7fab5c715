"""On-chip A/B of the causal flash-attention kernels at LLM calibration dims
(b=4, h=32, s=2048, hd=128, bf16 — the perplexity/2SSP-search workload shape).

Compares (all through the dispatch API):
  - full_rectangle: the single-pass kernel that computes all [BLOCK_Q, S]
    logits and masks the upper triangle away (dispatch default),
  - block_skip: the online-softmax causal kernel that only visits K blocks
    at or below the diagonal (opt-in SSP_X_VIT_FLASH_BLOCK_SKIP=1; measured
    negative, kept for the record),
  - XLA sdpa reference, plus the jax-shipped official/splash kernels as
    achievability probes.

With BENCH_HKV < BENCH_H it instead A/Bs the GQA-native path vs repeating
K/V before the kernel.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
from ssp_x_vit_tpu.ops.attention import sdpa_reference
from ssp_x_vit_tpu.ops.pallas import flash_attention as fa


def main():
    b, h, s, hd = (int(os.environ.get(k, d)) for k, d in
                   (("BENCH_B", 4), ("BENCH_H", 32), ("BENCH_S", 2048),
                    ("BENCH_HD", 128)))
    hkv = int(os.environ.get("BENCH_HKV", h))  # < h benches the GQA-native path
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    print(f"backend={jax.default_backend()} b={b} h={h} hkv={hkv} s={s} hd={hd} bf16",
          flush=True)

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, hd), jnp.bfloat16)

    # full-rectangle FLOPs for a comparable effective-TF/s number
    flops = 4 * b * h * s * s * hd
    results = {}

    def bench(name, fn):
        ms = measure_latency_scan(fn, q, k, v, iters=iters)
        tf = flops / (ms / 1e3) / 1e12
        results[name] = {"ms": round(ms, 3), "eff_tf_per_s": round(tf, 1)}
        print(f"{name:>16}: {ms:7.3f} ms  ({tf:6.1f} TF/s on full-rect flops)",
              flush=True)

    rep = h // hkv

    def repeat_kv(k_, v_):
        return jnp.repeat(k_, rep, axis=1), jnp.repeat(v_, rep, axis=1)

    if rep > 1:
        # GQA A/B: kernel-shared K/V vs materializing repeated K/V in HBM.
        bench("gqa_native", lambda q_, k_, v_: fa.flash_attention(q_, k_, v_, causal=True))
        bench("repeat_flash", lambda q_, k_, v_: fa.flash_attention(
            q_, *repeat_kv(k_, v_), causal=True))
        bench("repeat_sdpa", lambda q_, k_, v_: sdpa_reference(
            q_, *repeat_kv(k_, v_), causal=True))
        print(json.dumps(results))
        return

    os.environ["SSP_X_VIT_FLASH_BLOCK_SKIP"] = "1"
    try:
        bench("block_skip", lambda q_, k_, v_: fa.flash_attention(q_, k_, v_, causal=True))
        # numerics for the block-skip kernel's bf16-exp fast path — must be
        # checked INSIDE the env-var window or the check silently validates
        # the default kernel instead.
        bs_out = np.asarray(jax.jit(lambda a, c, d: fa.flash_attention(
            a, c, d, causal=True))(q, k, v), np.float32)
    finally:
        del os.environ["SSP_X_VIT_FLASH_BLOCK_SKIP"]
    bench("full_rectangle", lambda q_, k_, v_: fa.flash_attention(q_, k_, v_, causal=True))
    bench("xla_sdpa", lambda q_, k_, v_: sdpa_reference(q_, k_, v_, causal=True))

    # Achievability probes: the jax-shipped TPU kernels (same hardware, so
    # whatever they reach is reachable).
    if os.environ.get("BENCH_OFFICIAL", "1") != "0":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as official_flash)

        scale = 1.0 / (hd ** 0.5)
        bench("official_flash", lambda q_, k_, v_: official_flash(
            q_, k_, v_, causal=True, sm_scale=scale))

        from jax.experimental.pallas.ops.tpu import splash_attention as sa

        mask = sa.MultiHeadMask([sa.CausalMask((s, s)) for _ in range(h)])
        splash_kernel = sa.make_splash_mha_single_device(mask)

        def splash(q_, k_, v_):
            return jax.vmap(splash_kernel)(q_ * jnp.bfloat16(scale), k_, v_)

        try:
            bench("splash", splash)
        except Exception as e:  # pragma: no cover - probe only
            print(f"splash failed: {type(e).__name__}: {e}", flush=True)

    # numerics at bf16 inputs: dispatch default AND the block-skip kernel
    # (bs_out captured above, inside the env-var window)
    out_new = np.asarray(jax.jit(lambda a, c, d: fa.flash_attention(
        a, c, d, causal=True))(q, k, v), np.float32)
    out_ref = np.asarray(jax.jit(lambda a, c, d: sdpa_reference(
        a, c, d, causal=True))(q, k, v), np.float32)
    results["max_abs_err_vs_sdpa_bf16"] = float(np.max(np.abs(out_new - out_ref)))
    results["blockskip_max_abs_err_vs_sdpa_bf16"] = float(
        np.max(np.abs(bs_out - out_ref)))
    print(f"max |err| vs sdpa (bf16): default {results['max_abs_err_vs_sdpa_bf16']:.2e}, "
          f"block_skip {results['blockskip_max_abs_err_vs_sdpa_bf16']:.2e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
