"""Self-speculative decoding benchmark on the TPU chip (b=1 latency case).

Dense greedy via serve.generate_kv_scan vs speculative_generate with:
- draft = the dense model itself (acceptance ~1 -> the mechanical upper
  bound of the draft/verify pipeline), and
- draft = the 37.5% 2SSP-pruned materialization (on RANDOM weights its
  proposals rarely match the dense argmax, so this is the acceptance~0
  lower bound; trained checkpoints sit between the two — the 2SSP paper's
  point is that pruned/dense agreement stays high).

  python scripts/bench_spec.py [--max-length 256] [--k 6] [--cache-dtype f32]

NOTE (measured, docs/tpu_notes.md): at bf16 the self-draft acceptance on
RANDOM weights collapses (~0.16) because random-init logits have near-tied
argmax margins (~0.03) comparable to bf16 rounding, and the draft's 1-token
decode matmul and the verifier's (k+1)-token extend matmul round differently.
--cache-dtype f32 restores the mechanical ~1.0 acceptance. Trained
checkpoints have wide argmax margins, so bf16 is the production setting.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--cache-dtype", choices=("bf16", "f32"), default="bf16")
    ap.add_argument("--matmul-precision", default=None,
                    choices=("default", "high", "highest"),
                    help="TPU MXU internal precision (default bf16 passes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    cdt = jnp.bfloat16 if args.cache_dtype == "bf16" else jnp.float32

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.pruning import (
        materialize_llm_depth_pruning, materialize_llm_width_pruning,
    )
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    keep = np.stack([np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:3520]) for i in range(cfg.num_layers)])
    pp, pc = materialize_llm_width_pruning(params, cfg, keep)
    pp, pc = materialize_llm_depth_pruning(pp, pc, [3, 7, 11])

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, args.prompt_len).astype(np.int32)
    M, K = args.max_length, args.k
    gen = M - args.prompt_len
    results = {"max_length": M, "k": K, "backend": jax.default_backend(),
               "cache_dtype": args.cache_dtype,
               "matmul_precision": args.matmul_precision or "default"}

    def timed(fn, reps=2):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    secs, _ = timed(lambda: generate_kv_scan(params, cfg, prompt, max_length=M,
                                             cache_dtype=cdt))
    results["dense_tok_s"] = round(gen / secs, 1)

    secs, out = timed(lambda: speculative_generate(
        params, cfg, params, cfg, prompt, max_length=M, k=K, cache_dtype=cdt))
    results["spec_self_draft_tok_s"] = round(gen / secs, 1)
    results["spec_self_draft_acceptance"] = round(out[1]["acceptance_rate"], 3)

    secs, out = timed(lambda: speculative_generate(
        params, cfg, pp, pc, prompt, max_length=M, k=K, cache_dtype=cdt))
    results["spec_pruned_draft_tok_s"] = round(gen / secs, 1)
    results["spec_pruned_draft_acceptance"] = round(out[1]["acceptance_rate"], 3)

    # int8-quantized pruned draft: the draft's per-step cost drops further
    # (weight-only int8 decode is 1.57x, scripts/bench_quant.py), raising the
    # all-accept ceiling (k+1) * rounds/s without touching the dense target.
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8

    qpp = quantize_llm_params_int8(pp, pc)
    secs, out = timed(lambda: speculative_generate(
        params, cfg, qpp, pc, prompt, max_length=M, k=K, cache_dtype=cdt))
    results["spec_int8_pruned_draft_tok_s"] = round(gen / secs, 1)
    results["spec_int8_pruned_draft_acceptance"] = round(
        out[1]["acceptance_rate"], 3)

    # int8-quantized DENSE draft: a compressed artifact of the *same*
    # weights, so draft/target agreement is quantization-error-bound rather
    # than pruning-bound — the realistic high-acceptance regime, measured
    # end-to-end at the production bf16 setting (VERDICT r2 #6).
    qdense = quantize_llm_params_int8(params, cfg)
    secs, out = timed(lambda: speculative_generate(
        params, cfg, qdense, cfg, prompt, max_length=M, k=K, cache_dtype=cdt))
    results["spec_int8_dense_draft_tok_s"] = round(gen / secs, 1)
    results["spec_int8_dense_draft_acceptance"] = round(
        out[1]["acceptance_rate"], 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
