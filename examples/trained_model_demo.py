"""Generate real text from the COMMITTED trained checkpoint — offline.

Every other example runs on random weights (egress-blocked checkpoints);
this one loads `ckpts/code_llm_small` — the 19M code-LM trained in-repo on
the host's own Python sources (Makefile reproduce-trained-llm-small) with
its byte-level BPE tokenizer committed alongside — and decodes actual
Python-looking text through the production serving path
(`generate_kv_scan`: whole generation in one dispatch, KV cache donated).

  python examples/trained_model_demo.py            # CPU, ~1 min
  python examples/trained_model_demo.py --sample   # top-p sampling

Reference contrast: the reference's generation path re-runs HF generate on
downloaded checkpoints (src/evaluation.py); here the checkpoint, tokenizer,
corpus slice, and serving stack are all in-repo and reproducible.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "ckpts", "code_llm_small")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="def load_json(path):\n")
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--sample", action="store_true",
                    help="top-p 0.9 / T 0.8 instead of greedy")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model
    from ssp_x_vit_tpu.llm.sampling import SamplingParams
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.llm.tokenizer import ByteLevelBPETokenizer

    tok = ByteLevelBPETokenizer.from_pretrained_dir(CKPT)
    params, cfg = load_llm_model(CKPT)  # bf16 by default
    ids = np.asarray(tok.encode(args.prompt), np.int32)
    print(f"model d={cfg.hidden_size} L={cfg.num_layers} "
          f"vocab={cfg.vocab_size}; prompt {ids.size} tokens", flush=True)

    kwargs = {}
    if args.sample:
        kwargs["sampling"] = SamplingParams(temperature=0.8, top_p=0.9)
        kwargs["rng"] = jax.random.PRNGKey(0)
    out = np.asarray(generate_kv_scan(params, cfg, ids,
                                      max_length=args.max_length, **kwargs))
    text = tok.decode([int(t) for t in out])
    print("-" * 60)
    print(text)
    print("-" * 60)
    print("(trained on the host's Python sources — expect plausible "
          "Python-shaped continuations, not correctness)")


if __name__ == "__main__":
    main()
