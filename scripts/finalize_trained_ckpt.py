"""Finalize a trained-LLM checkpoint into the committed pinned artifact
(VERDICT r4 #5): copy the exact held-out token slice next to the weights and
pin the held-out ppl that tests/test_trained_ckpt.py re-measures on every CI
run (±5%).

The val slice is COPIED INTO the checkpoint dir (uint16 token ids, ~2 bytes/
token) so re-measurement needs no corpus rebuild; the pinned ppl is computed
on CPU at f32 — the exact environment the test suite uses — via the same
evaluate_perplexity(seq_len=1024, batch_size=2) call the test makes.

  python scripts/finalize_trained_ckpt.py --ckpt ckpts/code_llm_small \
      --corpus artifacts/code_corpus [--val-tokens 131072] \
      [--meta-extra '{"steps": 3000, ...}']
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/code_llm_small")
    ap.add_argument("--corpus", default="artifacts/code_corpus")
    ap.add_argument("--val-tokens", type=int, default=131072,
                    help="tokens of val.bin committed alongside (256 KiB)")
    ap.add_argument("--meta-extra", default=None,
                    help="JSON dict merged into train_meta.json "
                         "(training recipe fields)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity

    sl = os.path.join(args.ckpt, "corpus_slice")
    os.makedirs(sl, exist_ok=True)
    val = np.memmap(os.path.join(args.corpus, "val.bin"), np.uint16, "r")
    np.asarray(val[: args.val_tokens]).tofile(os.path.join(sl, "val.bin"))
    # small train slice too: scripts/bench_trained.py calibrates 2SSP from
    # train.bin — the committed slice must be self-sufficient for it
    train = np.memmap(os.path.join(args.corpus, "train.bin"), np.uint16, "r")
    np.asarray(train[: args.val_tokens]).tofile(os.path.join(sl, "train.bin"))
    tok_json = os.path.join(args.corpus, "tokenizer.json")
    if os.path.exists(tok_json):
        shutil.copy(tok_json, os.path.join(args.ckpt, "tokenizer.json"))

    import jax.numpy as jnp

    params, cfg = load_llm_model(args.ckpt)
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    ids = np.asarray(val[:16384], np.int32)
    ppl = float(evaluate_perplexity(params, cfg, ids, seq_len=1024,
                                    batch_size=2, enable_tqdm=False))

    meta = {"val_ppl_16k": round(ppl, 4), "val_tokens_committed": args.val_tokens,
            "eval": "cpu f32 evaluate_perplexity(seq_len=1024, batch_size=2) "
                    "on corpus_slice/val.bin[:16384] — the exact call "
                    "tests/test_trained_ckpt.py re-runs (tolerance 5%)",
            "params_M": round(sum(int(np.prod(a.shape))
                                  for a in jax.tree.leaves(params)) / 1e6, 2)}
    if args.meta_extra:
        meta.update(json.loads(args.meta_extra))
    mp = os.path.join(args.ckpt, "train_meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            old = json.load(f)
        old.update(meta)
        meta = old
    with open(mp, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
