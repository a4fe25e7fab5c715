"""LLM forward-throughput benchmark on the TPU chip (tokens/sec).

A ~1.1B-param Llama-layout model at seq 2048 — the 2SSP LLM calibration/eval
workload shape — comparing the flash-attention dispatch against plain XLA
attention, plus the 37.5%-2SSP-pruned architecture.

  python scripts/bench_llm.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward
from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
from ssp_x_vit_tpu.ops import dispatch


def main():
    b = int(os.environ.get("LLM_BENCH_BATCH", "4"))
    s = int(os.environ.get("LLM_BENCH_SEQ", "2048"))
    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=16, intermediate_size=5632)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(
        jax.eval_shape(lambda k: init_llama_params(k, cfg, dtype=jnp.bfloat16),
                       jax.random.PRNGKey(0))))
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size,
                                dtype=jnp.int32)

    def fwd(tokens, params):
        return llama_forward(params, tokens, cfg)[0]

    results = {"params_M": round(n_params / 1e6, 1), "batch": b, "seq": s,
               "backend": jax.default_backend()}
    for name, flash in (("xla", False), ("flash", True)):
        dispatch.set_pallas_enabled(flash)
        ms = measure_latency_scan(fwd, tokens, params, iters=8)
        results[f"{name}_ms_per_fwd"] = round(ms, 2)
        results[f"{name}_tokens_per_s"] = round(b * s / (ms / 1e3))
        print(f"[{name}] {ms:.2f} ms/fwd = {results[f'{name}_tokens_per_s']} tok/s",
              flush=True)

    # 37.5%-pruned architecture (uniform 2SSP width + 1/4 of attentions gone)
    dispatch.set_pallas_enabled(True)
    from ssp_x_vit_tpu.llm.pruning import (
        materialize_llm_width_pruning, materialize_llm_depth_pruning,
    )

    keep = [np.arange(int(cfg.intermediate_size * 0.62))] * cfg.num_layers
    p2, c2 = materialize_llm_width_pruning(params, cfg, keep)
    p2, c2 = materialize_llm_depth_pruning(p2, c2, list(range(0, cfg.num_layers, 4)))

    from ssp_x_vit_tpu.llm.model import llama_forward_materialized

    def fwd_p(tokens, p):
        return llama_forward_materialized(p, tokens, c2)

    ms = measure_latency_scan(fwd_p, tokens, p2, iters=8)
    results["pruned375_ms_per_fwd"] = round(ms, 2)
    results["pruned375_tokens_per_s"] = round(b * s / (ms / 1e3))
    print(f"[pruned 37.5%] {ms:.2f} ms/fwd = {results['pruned375_tokens_per_s']} tok/s",
          flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
