"""Trained-checkpoint measurements: retire the random-weights caveats.

Loads the code-LM checkpoint produced by scripts/prepare_code_corpus.py +
cli.train_llm (VERDICT r3 #2) and measures, on REAL (trained) weights:

1. held-out perplexity: dense bf16 vs int8 / int4 weight-only vs int8+W8A8
   (the quantization quality deltas the random-weight rows couldn't claim);
2. a 2SSP sparsity-vs-perplexity curve at 25/37.5/50% (the reference's
   headline table, reports/report-*.md, on our offline corpus);
3. speculative decoding: self-draft and 2SSP-pruned-draft acceptance +
   tokens/sec vs plain dense greedy (reference has no serving story; the
   random-weight rows measured acceptance 0.875/0.0 which says nothing).

  python scripts/bench_trained.py --ckpt artifacts/code_llm_197m \
      [--corpus artifacts/code_corpus] [--eval-tokens 65536]

Writes docs/trained_bench.json and prints one JSON line.
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
    ap.add_argument("--ckpt", default="artifacts/code_llm_197m")
    ap.add_argument("--corpus", default="artifacts/code_corpus")
    ap.add_argument("--eval-tokens", type=int, default=65536)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--calib-samples", type=int, default=4)
    ap.add_argument("--spec-max-length", type=int, default=256)
    ap.add_argument("--spec-k", type=int, default=6)
    ap.add_argument("--skip-curve", action="store_true")
    ap.add_argument("--out", default="docs/trained_bench.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model
    from ssp_x_vit_tpu.llm.datasets import get_calibration
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
    from ssp_x_vit_tpu.llm.pruning import two_stage_2ssp
    from ssp_x_vit_tpu.llm.quant import (quantize_llm_params_int4,
                                         quantize_llm_params_int8)
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    params, cfg = load_llm_model(args.ckpt)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    S = args.seq_len

    val = np.memmap(os.path.join(args.corpus, "val.bin"), np.uint16, "r")
    eval_ids = np.asarray(val[: args.eval_tokens], np.int32)
    train = np.memmap(os.path.join(args.corpus, "train.bin"), np.uint16, "r")
    # calibration windows drawn from the train split (the reference
    # calibrates on C4-train and evaluates wikitext-test, src/main.py:48-61)
    calib = get_calibration(np.asarray(train[: 64 * S], np.int32),
                            args.calib_samples, seq_len=S)

    res = {"ckpt": args.ckpt, "params_cfg": f"d={cfg.hidden_size} "
           f"L={cfg.num_layers} H={cfg.num_heads} KV={cfg.num_kv_heads} "
           f"f={cfg.intermediate_size} V={cfg.vocab_size}",
           "eval_tokens": args.eval_tokens, "seq_len": S,
           "backend": jax.default_backend()}

    def ppl(p, c):
        return float(evaluate_perplexity(p, c, eval_ids, seq_len=S,
                                         batch_size=4, enable_tqdm=False))

    t0 = time.time()
    res["ppl_dense_bf16"] = ppl(params, cfg)
    print(f"dense ppl {res['ppl_dense_bf16']:.4f} ({time.time()-t0:.0f}s)",
          flush=True)

    q8 = quantize_llm_params_int8(params, cfg)
    res["ppl_int8w"] = ppl(q8, cfg)
    q4 = quantize_llm_params_int4(params, cfg)
    res["ppl_int4w"] = ppl(q4, cfg)
    from ssp_x_vit_tpu.ops import dispatch

    dispatch.set_w8a8_enabled(True)
    try:
        jax.clear_caches()
        res["ppl_int8_w8a8"] = ppl(q8, cfg)
    finally:
        dispatch.set_w8a8_enabled(False)
        jax.clear_caches()
    print(f"quant ppl int8 {res['ppl_int8w']:.4f} int4 {res['ppl_int4w']:.4f}"
          f" w8a8 {res['ppl_int8_w8a8']:.4f}", flush=True)

    pruned_cache = {}
    if not args.skip_curve:
        curve = {}
        for rate in (0.25, 0.375, 0.5):
            out = two_stage_2ssp(params, cfg, calib, rate, seq_len=S)
            if out is False:
                curve[str(rate)] = None
                continue
            p2, c2, info = out
            curve[str(rate)] = {
                "ppl": ppl(p2, c2),
                "pruned_attention_blocks": info["pruned_attention_blocks"],
                "kept_ffn": info["num_preserve_mlp"]
                if "num_preserve_mlp" in info else info.get("num_preserve"),
            }
            pruned_cache[rate] = (p2, c2)
            print(f"2ssp@{rate}: ppl {curve[str(rate)]['ppl']:.4f}",
                  flush=True)
        res["2ssp_curve"] = curve

    # --- speculative decoding on trained weights ---------------------------
    prompt = np.asarray(val[: 64], np.int32)
    M, K = args.spec_max_length, args.spec_k
    gen = M - prompt.size

    def timed(fn, reps=2):
        fn()
        best = float("inf")
        for _ in range(reps):
            t1 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t1)
        return best, out

    t, dense_out = timed(lambda: np.asarray(generate_kv_scan(
        params, cfg, prompt, max_length=M)))
    res["spec_dense_tok_s"] = round(gen / t, 1)

    t, (toks, stats) = timed(lambda: speculative_generate(
        params, cfg, params, cfg, prompt, max_length=M, k=K))
    res["spec_self_draft_tok_s"] = round(gen / t, 1)
    res["spec_self_draft_acceptance"] = round(stats["acceptance_rate"], 3)
    res["spec_self_draft_exact"] = bool(
        (np.asarray(toks)[:M] == np.asarray(dense_out)[:M]).all())

    if 0.375 in pruned_cache:
        p2, c2 = pruned_cache[0.375]
        t, (toks, stats) = timed(lambda: speculative_generate(
            params, cfg, p2, c2, prompt, max_length=M, k=K))
        res["spec_pruned375_draft_tok_s"] = round(gen / t, 1)
        res["spec_pruned375_draft_acceptance"] = round(
            stats["acceptance_rate"], 3)
        res["spec_pruned375_draft_exact"] = bool(
            (np.asarray(toks)[:M] == np.asarray(dense_out)[:M]).all())

    res["weights_note"] = "trained code-LM checkpoint (scripts/prepare_code_corpus.py + cli.train_llm)"
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
