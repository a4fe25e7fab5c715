"""GQA serving A/B on the TPU chip: grouped-einsum cached attention (new)
vs repeating the KV cache to full head count every step (old path,
reconstructed locally and monkeypatched in).

Decode at long context is KV-cache-bandwidth-bound: at b=8, max_len 2048,
16 layers, h=16/hkv=4, hd=128 bf16, the repeated-cache read is ~2.1 GB/step
vs 0.54 GB un-repeated — whether that shows up depends on how well XLA
fuses the repeat (broadcast) into the attention einsum, hence: measure.

  python scripts/bench_serve_gqa.py [--batch 8] [--prompt-len 64] [--max-length 2048]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_generate(fn, reps=2):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm import serve
    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=4, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

    rng = np.random.default_rng(0)
    P, M, B = args.prompt_len, args.max_length, args.batch
    prompts = [rng.integers(0, cfg.vocab_size, P).tolist() for _ in range(B)]
    arg = np.asarray(prompts[0], np.int32) if B == 1 else prompts
    results = {"params_M": round(n_params / 1e6, 1), "batch": B,
               "prompt_len": P, "max_length": M,
               "heads": cfg.num_heads, "kv_heads": cfg.num_kv_heads,
               "backend": jax.default_backend()}
    print(f"backend={jax.default_backend()} {results['params_M']}M "
          f"h={cfg.num_heads} hkv={cfg.num_kv_heads} b={B} M={M}", flush=True)

    grouped = serve._attend_cached  # the shipped grouped-einsum path

    def attend_repeat(q, ck, cv, query_positions, pad_lens, c, rolling=None,
                      window_bound=None):
        """Round-2 behavior: repeat the cache to h heads, MHA einsum."""
        assert rolling is None and window_bound is None  # no windows here
        b, s_q, h, hd = q.shape
        rep = c.num_heads // c.num_kv_heads
        quant = isinstance(ck, dict)
        k_raw, v_raw = (ck["q"], cv["q"]) if quant else (ck, cv)
        k = jnp.repeat(k_raw, rep, axis=2)
        v = jnp.repeat(v_raw, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        if quant:
            ks = jnp.repeat(ck["s"], rep, axis=2)
            logits = logits * ks.transpose(0, 2, 1)[:, :, None, :]
        logits = logits / (hd ** 0.5)
        key_idx = jnp.arange(k.shape[1])
        causal = key_idx[None, None, :] <= query_positions[:, :, None]
        valid = key_idx[None, None, :] >= pad_lens[:, None, None]
        mask = (causal & valid)[:, None]
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(logits, axis=-1)
        if quant:
            vs = jnp.repeat(cv["s"], rep, axis=2)
            w = w * vs.transpose(0, 2, 1)[:, :, None, :]
        w = w.astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(q.dtype)).reshape(
            b, s_q, h * hd)

    gen = B * (M - P)
    outs = {}
    for name, impl in (("grouped", grouped), ("repeat", attend_repeat)):
        serve._attend_cached = impl
        # serve's jits are module-level: without clearing the jit cache the
        # second arm would silently reuse the first arm's compiled code and
        # the A/B would measure the same kernel twice.
        jax.clear_caches()
        try:
            secs = time_generate(
                lambda: serve.generate_kv_scan(params, cfg, arg, max_length=M))
            # correctness cross-check: both paths must emit identical greedy ids
            outs[name] = np.asarray(
                serve.generate_kv_scan(params, cfg, arg, max_length=M))
        finally:
            serve._attend_cached = grouped
        tps = gen / secs
        results[name] = {"wall_s": round(secs, 3), "tokens_per_s": round(tps, 1)}
        print(f"[{name}] {secs:.3f}s = {tps:.0f} tok/s", flush=True)

    a, b = outs["grouped"], outs["repeat"]
    results["greedy_ids_match"] = bool(np.array_equal(a, b))
    if not results["greedy_ids_match"]:
        # bf16 + random weights: argmax near-ties flip between
        # differently-shaped einsums (docs/tpu_notes.md round-2 gotcha), and
        # one flipped token diverges the rest of that sequence
        # autoregressively. Report where each sequence first diverges —
        # late/no divergence = tie-flip, position-0 divergence = real bug.
        div = [int(np.argmax(r)) if r.any() else -1
               for r in (a != b).reshape(a.shape[0], -1)]
        results["first_divergence_per_seq"] = div
        print(f"first divergence per sequence (-1 = identical): {div}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
