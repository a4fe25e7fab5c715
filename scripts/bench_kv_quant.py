"""int8 KV cache benchmark on the TPU chip (long-context decode).

The static-shape attention in serve contracts over the FULL max_len cache
every step, so at long max_len the cache stream rivals the weight stream
(953M, b=8, max_len 2048 bf16: ~2.1 GiB cache vs 1.78 GiB weights per
step). int8 KV halves the cache bytes; combined with int8 weights the whole
per-step HBM stream is halved.

  python scripts/bench_kv_quant.py [--max-length 2048] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, reps=2):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qp = quantize_llm_params_int8(params, cfg)

    rng = np.random.default_rng(0)
    P, M, B = args.prompt_len, args.max_length, args.batch
    gen = M - P
    prompts = [rng.integers(0, cfg.vocab_size, P).astype(np.int32)
               for _ in range(B)]
    arg = prompts[0] if B == 1 else prompts

    res = {"prompt_len": P, "max_length": M, "batch": B,
           "backend": jax.default_backend()}
    for tag, p, cd in [
        ("bf16w_bf16kv", params, jnp.bfloat16),
        ("bf16w_int8kv", params, jnp.int8),
        ("int8w_bf16kv", qp, jnp.bfloat16),
        ("int8w_int8kv", qp, jnp.int8),
    ]:
        secs = timed(lambda p=p, cd=cd: generate_kv_scan(
            p, cfg, arg, max_length=M, cache_dtype=cd))
        res[tag + "_tok_s"] = round(B * gen / secs, 1)
    res["kv_speedup_bf16w"] = round(
        res["bf16w_int8kv_tok_s"] / res["bf16w_bf16kv_tok_s"], 2)
    res["full_int8_speedup"] = round(
        res["int8w_int8kv_tok_s"] / res["bf16w_bf16kv_tok_s"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
