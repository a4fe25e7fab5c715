"""Triage the trained-weights speculative exactness failure (VERDICT r4 #3).

docs/trained_bench.json recorded spec_self_draft_exact=false at acceptance
1.0: speculative output diverges from plain greedy decode on trained weights.
Hypothesis (docs/tpu_notes.md bf16-argmax mechanism): the dense model's
logits come from DIFFERENTLY SHAPED matmuls in the two paths — plain decode
is a 1-token `_decode_body` step, speculative verification is a (k+1)-token
`_extend_body` window — and MXU bf16 accumulation orders differ by shape, so
argmax near-ties flip. The tokens are equivalent-quality; the bitstreams
differ.

This script PROVES OR REFUTES that on a real checkpoint:

1. generate dense greedy + spec self-draft at bf16; locate the first
   divergence position;
2. recompute the full-precision logits (f32 params, highest matmul
   precision, full recompute forward) at that position: report the top-2
   tokens and their logit gap. Verdict bf16-tie iff {dense_token,
   spec_token} == {top1, top2} and the f32 gap is within bf16 resolution
   (|gap| <= ~2^-8 * |logit| scale, reported, not assumed);
3. re-run BOTH paths at f32/highest: they must agree exactly (the invariant
   tests/test_trained_ckpt.py pins in the suite).

  python scripts/diag_spec_exact.py [--ckpt ckpts/code_llm_small] [--cpu]

Prints one JSON line; paste the verdict into docs/serving.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/code_llm_small")
    ap.add_argument("--corpus-slice", default=None,
                    help="dir with val.bin for the prompt; default "
                         "<ckpt>/corpus_slice")
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model
    from ssp_x_vit_tpu.llm.model import llama_forward
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    params32, cfg = load_llm_model(args.ckpt)
    params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params32)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)

    sl = args.corpus_slice or os.path.join(args.ckpt, "corpus_slice")
    val = np.memmap(os.path.join(sl, "val.bin"), np.uint16, "r")
    prompt = np.asarray(val[:64], np.int32)
    M, K = args.max_length, args.k

    res = {"ckpt": args.ckpt, "backend": jax.default_backend(),
           "max_length": M, "k": K}

    # --- 1. bf16 divergence ------------------------------------------------
    dense = np.asarray(generate_kv_scan(params, cfg, prompt, max_length=M))
    spec, stats = speculative_generate(params, cfg, params, cfg, prompt,
                                       max_length=M, k=K)
    spec = np.asarray(spec)[:M]
    dense = dense[:M]
    res["bf16_acceptance"] = round(stats["acceptance_rate"], 3)
    diff = np.nonzero(dense != spec)[0]
    res["bf16_exact"] = not diff.size
    if diff.size:
        i = int(diff[0])
        res["first_divergence_pos"] = i
        res["dense_token"] = int(dense[i])
        res["spec_token"] = int(spec[i])

        # --- 2. full-precision logits at the divergence point -------------
        prefix = jnp.asarray(dense[:i][None])
        with jax.default_matmul_precision("highest"):
            logits, _ = llama_forward(params32, prefix, cfg,
                                      compute_dtype=jnp.float32)
        last = np.asarray(logits[0, -1], np.float64)
        order = np.argsort(last)[::-1]
        t1, t2 = int(order[0]), int(order[1])
        gap = float(last[t1] - last[t2])
        scale = float(np.abs(last[order[:8]]).max())
        res["f32_top2"] = [t1, t2]
        res["f32_top2_gap"] = round(gap, 6)
        res["f32_logit_scale"] = round(scale, 3)
        res["gap_rel_bf16_eps"] = round(gap / (scale * 2.0 ** -8), 3)
        res["both_tokens_in_f32_top2"] = sorted(
            (int(dense[i]), int(spec[i]))) == sorted((t1, t2))

    # --- 3. f32/highest exactness invariant --------------------------------
    with jax.default_matmul_precision("highest"):
        jax.clear_caches()
        dense32 = np.asarray(generate_kv_scan(
            params32, cfg, prompt, max_length=M, cache_dtype=jnp.float32))
        spec32, stats32 = speculative_generate(
            params32, cfg, params32, cfg, prompt, max_length=M, k=K,
            cache_dtype=jnp.float32)
    jax.clear_caches()
    res["f32_highest_exact"] = bool(
        (np.asarray(spec32)[:M] == dense32[:M]).all())
    res["f32_highest_acceptance"] = round(stats32["acceptance_rate"], 3)

    verdict = ("bf16_argmax_tie" if (not res["bf16_exact"]
               and res.get("both_tokens_in_f32_top2")
               and res["f32_highest_exact"])
               else ("exact" if res["bf16_exact"] else "REAL_BUG"))
    res["verdict"] = verdict
    print(json.dumps(res))


if __name__ == "__main__":
    main()
