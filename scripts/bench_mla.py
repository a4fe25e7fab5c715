"""MLA (DeepSeek-V3-style) vs MHA decode throughput on the TPU chip.

Head-to-head at matched hidden size / depth / FFN / vocab (~1B class):
a dense MLA model (llm/deepseek.py, compressed-cache absorbed decode)
against the equivalent MHA llama layout (llm/serve.py generate_kv_scan).
MLA's per-token cache is (kv_lora_rank + qk_rope_head_dim) floats shared
by all heads vs 2*heads*head_dim for MHA — the decode-attention HBM
traffic shrinks by that same ratio, which is the architecture's serving
selling point; this script measures how much of it the absorbed-decode
implementation realizes end-to-end.

Timing: wall-clock around whole-generation calls (np.asarray fetch is the
barrier — docs/tpu_notes.md); first call per config compiles, timed calls
run from cache.

  python scripts/bench_mla.py [--prompt-len 64] [--max-length 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_call(fn, reps=2):
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
    ap.add_argument("--paged", action="store_true",
                    help="also A/B the paged continuous-batching servers")
    ap.add_argument("--int8", action="store_true",
                    help="also measure int8-weight variants at b=1")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.deepseek import (DeepseekConfig,
                                            deepseek_generate,
                                            init_deepseek_params,
                                            mla_cache_bytes_per_token)
    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    P, M = args.prompt_len, args.max_length
    gen = M - P
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 32000, size=(P,)).astype(np.int32)

    # matched skeleton: hidden 2048, 16 layers, FFN 5632, vocab 32k
    mla_cfg = DeepseekConfig(
        vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=16,
        q_lora_rank=None, kv_lora_rank=512, qk_nope_head_dim=128,
        qk_rope_head_dim=64, v_head_dim=128, intermediate_size=5632,
        n_routed_experts=0)
    mha_cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                          num_heads=16, num_kv_heads=16,
                          intermediate_size=5632)

    mla_params = init_deepseek_params(jax.random.PRNGKey(0), mla_cfg,
                                      dtype=jnp.bfloat16)
    mha_params = init_llama_params(jax.random.PRNGKey(0), mha_cfg,
                                   dtype=jnp.bfloat16)
    count = lambda p: sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))

    results = {
        "backend": jax.default_backend(),
        "prompt_len": P, "max_length": M,
        "mla_params_M": round(count(mla_params) / 1e6, 1),
        "mha_params_M": round(count(mha_params) / 1e6, 1),
        "mla_cache_bytes_per_token_per_layer":
            mla_cache_bytes_per_token(mla_cfg),
        "mha_cache_bytes_per_token_per_layer":
            2 * mha_cfg.num_heads * mha_cfg.head_dim * 2,
    }

    t = time_call(lambda: deepseek_generate(
        mla_params, mla_cfg, prompt, max_new_tokens=gen))
    results["mla_b1_tok_per_s"] = round(gen / t, 1)

    t = time_call(lambda: generate_kv_scan(
        mha_params, mha_cfg, prompt[None], max_length=M))
    results["mha_b1_tok_per_s"] = round(gen / t, 1)

    results["mla_vs_mha_b1"] = round(
        results["mla_b1_tok_per_s"] / results["mha_b1_tok_per_s"], 2)

    # batched whole-generation: weights amortize over rows, the per-step
    # traffic shifts to the CACHE — where MLA's 7.1x smaller per-token
    # footprint (1152 vs 8192 B/layer) is the architecture's whole point
    B = args.batch
    prompts_b = rng.integers(0, 32000, size=(B, P)).astype(np.int32)
    t = time_call(lambda: deepseek_generate(
        mla_params, mla_cfg, prompts_b, max_new_tokens=gen))
    results[f"mla_b{B}_tok_per_s"] = round(B * gen / t, 1)
    t = time_call(lambda: generate_kv_scan(
        mha_params, mha_cfg, prompts_b, max_length=M))
    results[f"mha_b{B}_tok_per_s"] = round(B * gen / t, 1)
    results[f"mla_vs_mha_b{B}"] = round(
        results[f"mla_b{B}_tok_per_s"] / results[f"mha_b{B}_tok_per_s"], 2)

    if args.int8:
        # int8 weights (per-out-channel scale epilogues): b=1 decode is
        # weight-bandwidth-bound, so halved weight bytes should show up
        # directly; MLA's absorbed decode adds the dequantized-kv_b matrix
        # per layer (rank-sized, negligible)
        from ssp_x_vit_tpu.llm.quant import (quantize_deepseek_params_int8,
                                             quantize_llm_params_int8)

        mla_q = quantize_deepseek_params_int8(mla_params, mla_cfg)
        mha_q = quantize_llm_params_int8(mha_params, mha_cfg)
        t = time_call(lambda: deepseek_generate(
            mla_q, mla_cfg, prompt, max_new_tokens=gen))
        results["mla_int8_b1_tok_per_s"] = round(gen / t, 1)
        t = time_call(lambda: generate_kv_scan(
            mha_q, mha_cfg, prompt[None], max_length=M))
        results["mha_int8_b1_tok_per_s"] = round(gen / t, 1)
        results["mla_int8_vs_bf16_b1"] = round(
            results["mla_int8_b1_tok_per_s"] / results["mla_b1_tok_per_s"], 2)

    if args.paged:
        # continuous-batching servers, host step loop (per-step dispatch
        # rides the tunnel; same loop shape for both, so the RATIO is the
        # signal). Page size 64, per-slot positions.
        from ssp_x_vit_tpu.llm.paged import PagedServer
        from ssp_x_vit_tpu.llm.paged_mla import MLAPagedServer

        def run_server(mk):
            srv = mk()
            for i in range(B):
                srv.add_request(prompts_b[i], max_new_tokens=gen)
            t0 = time.perf_counter()
            srv.run()
            return time.perf_counter() - t0

        np_pages = 1 + B * (-(-M // 64))
        mk_mla = lambda: MLAPagedServer(
            mla_params, mla_cfg, max_batch=B, num_pages=np_pages,
            page_size=64, max_context=M + 64)
        mk_mha = lambda: PagedServer(
            mha_params, mha_cfg, max_batch=B, num_pages=np_pages,
            page_size=64, max_context=M + 64)
        run_server(mk_mla)  # compile
        results[f"mla_paged_b{B}_tok_per_s"] = round(
            B * gen / run_server(mk_mla), 1)
        run_server(mk_mha)  # compile
        results[f"mha_paged_b{B}_tok_per_s"] = round(
            B * gen / run_server(mk_mha), 1)
        results[f"mla_vs_mha_paged_b{B}"] = round(
            results[f"mla_paged_b{B}_tok_per_s"]
            / results[f"mha_paged_b{B}_tok_per_s"], 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
