"""LLM training-step throughput on the TPU chip (tokens/sec).

853M-param Llama layout (hidden 2048, 16 layers, GQA h=16/hkv=4), b=2
s=2048, bf16 compute over f32 params, adamw, per-layer remat (b=4 exceeds
the 16 GB HBM by ~240 MB: f32 params 3.4 + adamw moments 6.8 + grads 3.4 GB
leave ~2 GB for activations/logits). A/B: flash
attention (pallas fwd + pallas single-pass bwd) vs XLA attention (pallas
disabled) — the model-level view of scripts/bench_flash_bwd.py's kernel
numbers. Timing via wall clock around a fetched loss (the only reliable
barrier over the tunnel, docs/tpu_notes.md).

  python scripts/bench_llm_train.py [--batch 4] [--seq 2048] [--steps 3]
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.train import make_llama_train_step
    from ssp_x_vit_tpu.ops.dispatch import set_pallas_enabled

    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, num_layers=16,
                      num_heads=16, num_kv_heads=4, intermediate_size=5632)
    B, S = args.batch, args.seq
    toks_per_step = B * (S - 1)
    results = {"batch": B, "seq": S, "backend": jax.default_backend()}

    opt = optax.adamw(1e-4)

    def bench(name, pallas):
        set_pallas_enabled(pallas)
        try:
            params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
            n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
            results["params_M"] = round(n / 1e6, 1)
            step = make_llama_train_step(cfg, opt, compute_dtype=jnp.bfloat16)
            opt_state = opt.init(params)
            toks = jnp.asarray(
                np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S)),
                jnp.int32)
            # params/opt_state are donated: thread them through like training
            params, opt_state, loss = step(params, opt_state, toks)  # compile
            _ = float(loss)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                params, opt_state, loss = step(params, opt_state, toks)
            _ = float(loss)  # barrier
            secs = (time.perf_counter() - t0) / args.steps
        finally:
            set_pallas_enabled(None)
        results[name] = {"step_s": round(secs, 3),
                         "tokens_per_s": round(toks_per_step / secs, 1),
                         "final_loss": round(float(loss), 4)}
        print(f"[{name}] {secs:.3f}s/step = {toks_per_step/secs:.0f} tok/s "
              f"(loss {float(loss):.4f})", flush=True)

    bench("flash_pallas", True)
    bench("xla_attention", False)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
