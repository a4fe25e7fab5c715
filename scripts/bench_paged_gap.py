"""Attribute the paged-vs-contiguous decode gap (VERDICT r3 #1).

docs/serving_bench.json records 174.5 tok/s paged vs 369.3 contiguous at
2048-ctx b=8 bf16 (whole-generation protocols). This script isolates the
DECODE STEP at the same shape — 64 greedy steps in one on-device scan at
position ~1984 over a full 2048-token cache — and decomposes the paged arm:

  contig        contiguous cache decode_scan (serve.py)    — the target
  paged         paged_decode_scan as shipped
  paged_nowrite paged with cache writes removed            — scatter cost
  paged_refattn paged with XLA-gather reference attention  — kernel vs ref
  paged_p128 /  page_size 128 / 256 arms                   — page-walk
  paged_p256    granularity cost (fewer, bigger page steps)

Pools/caches are initialized with random data at the target lengths (decode
cost is data-independent); each timed rep re-creates them because the scans
donate. Monkeypatched arms call jax.clear_caches() around themselves —
module-level jits otherwise keep the originally traced code (CLAUDE.md
round-3 gotcha).

  python scripts/bench_paged_gap.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 64


def main():
    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm import paged as paged_mod
    from ssp_x_vit_tpu.llm import serve as serve_mod
    from ssp_x_vit_tpu.ops.pallas import paged_attention as pa_mod

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B, CTX = 8, 2048
    START = CTX - STEPS  # 1984: decode the last 64 positions
    res = {"batch": B, "ctx": CTX, "steps": STEPS,
           "backend": jax.default_backend()}

    key = jax.random.PRNGKey(1)
    first = jnp.asarray(np.random.default_rng(0).integers(0, 32000, B),
                        jnp.int32)

    def time_arm(mk_state, run, reps=2):
        best = float("inf")
        for r in range(reps + 1):  # rep 0 = compile warmup
            state = mk_state()
            jax.block_until_ready(state)
            t0 = time.perf_counter()
            out = run(state)
            # fetch a small value as the completion barrier (CLAUDE.md:
            # block_until_ready is unreliable on the tunnel)
            np.asarray(jax.tree.leaves(out)[0][:1])
            dt = time.perf_counter() - t0
            if r > 0:
                best = min(best, dt)
        return B * STEPS / best, best / STEPS * 1e3  # tok/s, ms/step

    # ---- contiguous ----
    def contig_state():
        ck, cv = serve_mod.init_cache(cfg, B, CTX, jnp.bfloat16)
        ck = jax.tree.map(
            lambda a: jax.random.normal(key, a.shape, jnp.float32).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, ck)
        return ck, cv

    def contig_run(state):
        ck, cv = state
        toks, _, _ = serve_mod.decode_scan(
            params, first, ck, cv, cfg, jnp.asarray(START, jnp.int32),
            jnp.zeros((B,), jnp.int32), STEPS)
        return toks

    res["contig_tok_s"], res["contig_ms_step"] = time_arm(contig_state, contig_run)

    # ---- paged (parameterized by page size) ----
    def paged_arm(page_size):
        mp = -(-CTX // page_size)
        num_pages = 1 + B * mp

        def mk_state():
            kp, vp = paged_mod.init_paged_pools(cfg, num_pages, page_size,
                                                jnp.bfloat16)
            kp = jax.random.normal(key, kp.shape, jnp.float32).astype(kp.dtype)
            pts = np.zeros((B, mp), np.int32)
            for i in range(B):
                pts[i] = np.arange(1 + i * mp, 1 + (i + 1) * mp)
            return kp, vp, jnp.asarray(pts)

        def run(state):
            kp, vp, pts = state
            toks, _, _ = paged_mod.paged_decode_scan(
                params, first, kp, vp, cfg, pts,
                jnp.full((B,), START, jnp.int32), STEPS)
            return toks

        return time_arm(mk_state, run)

    res["paged_tok_s"], res["paged_ms_step"] = paged_arm(64)

    # ---- paged, writes removed (isolates the scatter cost) ----
    orig_write = paged_mod.paged_cache_write
    jax.clear_caches()
    paged_mod.paged_cache_write = \
        lambda kp, vp, k, v, pt, sl, layer_idx=None: (kp, vp)
    try:
        res["paged_nowrite_tok_s"], res["paged_nowrite_ms_step"] = paged_arm(64)
    finally:
        paged_mod.paged_cache_write = orig_write
        jax.clear_caches()

    # ---- paged, XLA-gather reference attention (kernel vs ref) ----
    orig_attn = paged_mod.paged_attention
    paged_mod.paged_attention = (
        lambda q, kp, vp, pt, sl, start_lens=None, softcap=None,
        layer_idx=None: pa_mod.paged_attention_reference(
            q, pa_mod._layer_of(kp, layer_idx),
            pa_mod._layer_of(vp, layer_idx), pt, sl, start_lens, softcap))
    try:
        res["paged_refattn_tok_s"], res["paged_refattn_ms_step"] = paged_arm(64)
    finally:
        paged_mod.paged_attention = orig_attn
        jax.clear_caches()

    # ---- page-size sensitivity ----
    res["paged_p128_tok_s"], res["paged_p128_ms_step"] = paged_arm(128)
    res["paged_p256_tok_s"], res["paged_p256_ms_step"] = paged_arm(256)

    res["write_cost_ms_step"] = round(
        res["paged_ms_step"] - res["paged_nowrite_ms_step"], 3)
    res["paged_vs_contig"] = round(
        res["paged_tok_s"] / res["contig_tok_s"], 3)
    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
