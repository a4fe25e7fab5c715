"""Paged vs contiguous serving benchmark on the TPU chip (tokens/sec).

Same ~1B bf16 model and protocol as scripts/bench_serve.py, comparing:
- contiguous cache + decode scan (serve.generate_kv_scan),
- paged pools + decode scan (paged.paged_generate; pallas page-walk kernel),
with RAGGED prompts for the paged row (its reason to exist: no left-padding,
per-sequence positions, page reuse).

  python scripts/bench_paged.py [--prompt-len 64] [--max-length 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_it(fn, reps=2):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.paged import paged_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    P, M, B = args.prompt_len, args.max_length, args.batch
    new_tokens = M - P
    results = {"prompt_len": P, "max_length": M, "batch": B,
               "backend": jax.default_backend()}

    prompts = [rng.integers(0, cfg.vocab_size, P).tolist() for _ in range(B)]

    secs = time_it(lambda: generate_kv_scan(params, cfg, prompts, max_length=M))
    results["contiguous_tok_s"] = round(B * new_tokens / secs, 1)

    secs = time_it(lambda: paged_generate(params, cfg, prompts,
                                          max_new_tokens=new_tokens))
    results["paged_tok_s"] = round(B * new_tokens / secs, 1)

    # ragged prompts: paged decodes each at its own position; the contiguous
    # path left-pads everyone to the longest bucket
    ragged = [rng.integers(0, cfg.vocab_size, int(l)).tolist()
              for l in np.linspace(8, P, B)]
    secs = time_it(lambda: generate_kv_scan(params, cfg, ragged, max_length=M))
    results["contiguous_ragged_tok_s"] = round(
        sum(M - len(r) for r in ragged) / secs, 1)
    secs = time_it(lambda: paged_generate(
        params, cfg, ragged,
        max_new_tokens=min(M - len(r) for r in ragged)))
    results["paged_ragged_tok_s"] = round(
        B * min(M - len(r) for r in ragged) / secs, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
