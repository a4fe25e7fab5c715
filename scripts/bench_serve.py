"""KV-cached serving benchmark on the TPU chip (tokens/sec).

Measures llm/serve.py's whole-generation-in-one-dispatch decode on a ~1B
Llama-layout bf16 model: dense b=1/b=8, the 37.5%-2SSP-pruned architecture
(the pruned-model speedup is the point of the framework), and a sampling row.
Timing is wall-clock around the generate call — its np.asarray() on the scan
output is a real value fetch, the only reliable barrier on the tunneled chip
(docs/tpu_notes.md). The first call per config compiles; the timed call runs
from cache.

  python scripts/bench_serve.py [--prompt-len 64] [--max-length 512]
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
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


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
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

    rng = np.random.default_rng(0)
    P, M = args.prompt_len, args.max_length
    gen_per_seq = M - P
    results = {"params_M": round(n_params / 1e6, 1), "prompt_len": P,
               "max_length": M, "backend": jax.default_backend()}

    def row(name, p, c, batch, **gen_kw):
        prompts = [rng.integers(0, c.base.vocab_size if hasattr(c, "base")
                                else c.vocab_size, P).tolist()
                   for _ in range(batch)]
        arg = np.asarray(prompts[0], np.int32) if batch == 1 else prompts

        def run():
            return generate_kv_scan(p, c, arg, max_length=M, **gen_kw)

        secs, _ = time_generate(run)
        tps = batch * gen_per_seq / secs
        results[name] = {"batch": batch, "wall_s": round(secs, 3),
                         "tokens_per_s": round(tps, 1)}
        print(f"[{name}] b={batch}: {secs:.3f}s = {tps:.0f} tok/s", flush=True)

    row("dense_b1", params, cfg, 1)
    row("dense_b8", params, cfg, 8)
    row("dense_b1_sampled", params, cfg, 1, temperature=0.8, top_k=40)

    # 37.5%-2SSP-pruned architecture: uniform width + 1/4 attentions removed.
    keep = [np.arange(int(cfg.intermediate_size * 0.62))] * cfg.num_layers
    p2, c2 = materialize_llm_width_pruning(params, cfg, keep)
    p2, c2 = materialize_llm_depth_pruning(p2, c2, list(range(0, cfg.num_layers, 4)))
    row("pruned375_b1", p2, c2, 1)
    row("pruned375_b8", p2, c2, 8)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
