"""Long-context paged-pool A/B: bf16 vs int8 KV pools at 2048-token context
(VERDICT r2 #5). Two protocols:

1. scan decode (paged_generate): b=8 prompts ~1536, 512 new tokens — the
   decision-grade throughput number (whole generation in one dispatch).
2. continuous-batching churn (PagedServer): staggered admits, early eos,
   page free/reuse — exercises admit/evict; absolute tok/s here is bounded
   by the per-step host dispatch floor of the tunneled chip (~2-3 ms), so
   read the bf16-vs-int8 RATIO, not the level.

  python scripts/bench_paged_longctx.py
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
    ap.add_argument("--prompt-len", type=int, default=1536)
    ap.add_argument("--new-tokens", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--page-size", type=int, default=64,
                    help="pool page size; round-4 micro A/B (bench_paged_gap) "
                         "measured 256 fastest on-chip (10.5 vs 27.4 ms/step)")
    ap.add_argument("--contig", action="store_true",
                    help="also measure contiguous-cache generate_kv_scan on "
                         "the IDENTICAL protocol (same prompts, 512 new) — "
                         "the end-to-end paged-vs-contiguous A/B")
    ap.add_argument("--skip-churn", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import jax

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.paged import PagedServer, paged_generate

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    P, N, B = args.prompt_len, args.new_tokens, args.batch
    PS = args.page_size
    res = {"prompt_len": P, "new_tokens": N, "batch": B,
           "context": P + N, "page_size": PS,
           "backend": jax.default_backend()}

    prompts = [rng.integers(0, cfg.vocab_size, P).tolist() for _ in range(B)]

    for tag, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        secs = time_it(lambda dtype=dtype: paged_generate(
            params, cfg, prompts, max_new_tokens=N, cache_dtype=dtype,
            page_size=PS))
        res[f"scan_{tag}_tok_s"] = round(B * N / secs, 1)
        print(f"[scan_{tag}] {res[f'scan_{tag}_tok_s']} tok/s", flush=True)
    res["scan_int8_speedup"] = round(
        res["scan_int8_tok_s"] / res["scan_bf16_tok_s"], 2)

    if args.contig:
        from ssp_x_vit_tpu.llm.serve import generate_kv_scan

        for tag, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
            secs = time_it(lambda dtype=dtype: generate_kv_scan(
                params, cfg, prompts, max_length=P + N, cache_dtype=dtype,
                early_stop=False))
            res[f"contig_{tag}_tok_s"] = round(B * N / secs, 1)
            print(f"[contig_{tag}] {res[f'contig_{tag}_tok_s']} tok/s",
                  flush=True)
        res["paged_vs_contig_bf16"] = round(
            res["scan_bf16_tok_s"] / res["contig_bf16_tok_s"], 2)

    if args.skip_churn:
        print(json.dumps(res))
        return

    # churn: 12 requests through 4 slots, staggered lengths/budgets, so pages
    # free and get reused mid-run (admission control + eviction on finish).
    # block = decode steps per host dispatch (PagedServer.step_many); 1 is
    # the historical step-per-dispatch protocol, 8 the engine default.
    def churn(dtype, block=1):
        # same total pool tokens (160 pages x 64) regardless of page size,
        # floored so 4 slots at max_context always fit (large PS under-
        # provisioned before: at PS=512, 4 seqs need 21 pages vs pool of 20)
        min_pages = 1 + 4 * -(-(P + N + 1) // PS)
        server = PagedServer(params, cfg, max_batch=4,
                             num_pages=max(min_pages, 160 * 64 // PS),
                             page_size=PS, max_context=P + N,
                             cache_dtype=dtype)
        reqs = [(rng.integers(0, cfg.vocab_size,
                              int(l)).tolist(), int(bud))
                for l, bud in zip(np.linspace(256, P, 12),
                                  np.linspace(32, 96, 12))]
        t0 = time.perf_counter()
        pending = list(reqs)
        # keep slots full while requests remain
        for p, bud in pending[:4]:
            server.add_request(p, max_new_tokens=bud)
        queued = 4
        total = 0
        while True:
            if not server.step_many(block):
                if queued >= len(pending):
                    break
            while queued < len(pending) and any(
                    not s.active for s in server.slots):
                p, bud = pending[queued]
                try:
                    server.add_request(p, max_new_tokens=bud)
                    queued += 1
                except RuntimeError:
                    break
        total = sum(len(v) - len(reqs[rid][0])
                    for rid, v in server.finished.items())
        return total / (time.perf_counter() - t0)

    for tag, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        churn(dtype)  # compile
        res[f"churn_{tag}_tok_s"] = round(churn(dtype), 1)
        print(f"[churn_{tag}] {res[f'churn_{tag}_tok_s']} tok/s", flush=True)
        churn(dtype, block=8)  # compile
        res[f"churn_{tag}_block8_tok_s"] = round(churn(dtype, block=8), 1)
        print(f"[churn_{tag}_block8] {res[f'churn_{tag}_block8_tok_s']} tok/s",
              flush=True)
    res["churn_int8_speedup"] = round(
        res["churn_int8_tok_s"] / res["churn_bf16_tok_s"], 2)

    # pool footprint at this context (int8 adds f32 per-token-per-head scales)
    pages = 1 + B * -(-(P + N + 1) // PS)
    elems = pages * PS * cfg.num_layers * cfg.num_kv_heads * 2  # (tok, head) k+v
    res["pool_gib_bf16"] = round(elems * cfg.head_dim * 2 / 2**30, 2)
    res["pool_gib_int8"] = round(elems * (cfg.head_dim * 1 + 4) / 2**30, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
