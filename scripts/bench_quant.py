"""Weight-only int8 serving benchmark on the TPU chip (tokens/sec).

Decode at b=1 is HBM-bandwidth-bound: every step streams the full weight set
through the MXU for one token. int8 weights halve the bytes, so the ceiling
is ~2x. This measures llm/quant.py's int8 path against the bf16 baseline on
the ~1B model (dense and 37.5%-2SSP-pruned — compression axes compose), same
harness as scripts/bench_serve.py.

  python scripts/bench_quant.py [--prompt-len 64] [--max-length 512]
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
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.pruning import (
        materialize_llm_depth_pruning, materialize_llm_width_pruning,
    )
    from ssp_x_vit_tpu.llm.quant import (
        quantize_llm_params_int4, quantize_llm_params_int8,
        quantized_param_bytes,
    )
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    keep = np.stack([np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:3520]) for i in range(cfg.num_layers)])
    pp, pc = materialize_llm_width_pruning(params, cfg, keep)
    pp, pc = materialize_llm_depth_pruning(pp, pc, [3, 7, 11])

    qp = quantize_llm_params_int8(params, cfg)
    qpp = quantize_llm_params_int8(pp, pc)
    qp4 = quantize_llm_params_int4(params, cfg)

    rng = np.random.default_rng(0)
    P, M = args.prompt_len, args.max_length
    gen = M - P
    results = {
        "prompt_len": P, "max_length": M, "backend": jax.default_backend(),
        "bf16_gib": round(quantized_param_bytes(params) / 2**30, 3),
        "int8_gib": round(quantized_param_bytes(qp) / 2**30, 3),
        "int4_gib": round(quantized_param_bytes(qp4) / 2**30, 3),
    }

    def run(tag, p, c, batch):
        prompts = [rng.integers(0, c.vocab_size, P).astype(np.int32)
                   for _ in range(batch)]
        arg = prompts[0] if batch == 1 else prompts
        secs = time_generate(
            lambda: generate_kv_scan(p, c, arg, max_length=M))
        results[tag] = round(batch * gen / secs, 1)

    run("dense_bf16_b1_tok_s", params, cfg, 1)
    run("dense_int8_b1_tok_s", qp, cfg, 1)
    run("dense_int4_b1_tok_s", qp4, cfg, 1)
    run("dense_bf16_b8_tok_s", params, cfg, 8)
    run("dense_int8_b8_tok_s", qp, cfg, 8)
    run("pruned_bf16_b1_tok_s", pp, pc, 1)
    run("pruned_int8_b1_tok_s", qpp, pc, 1)
    results["int8_speedup_b1"] = round(
        results["dense_int8_b1_tok_s"] / results["dense_bf16_b1_tok_s"], 2)
    results["int8_pruned_speedup_b1"] = round(
        results["pruned_int8_b1_tok_s"] / results["pruned_bf16_b1_tok_s"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
