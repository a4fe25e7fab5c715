"""End-to-end LLM training walkthrough: pretrain (synthetic) -> 2SSP prune
-> recovery finetune -> perplexity before/after.

Runnable offline on CPU in a few minutes (tiny config); the same API scales
to the measured 853M/16.8k-tok/s single-chip step (scripts/bench_llm_train.py)
and the dp x tp sharded step (parallel/llm_sharding.py). The reference
framework never trains (pruning + evaluation only) — this walkthrough covers
the rebuild's beyond-reference training subsystem, including the production
prune -> recover loop: a brief finetune typically claws back most of the
pruning-induced loss.

  python examples/llm_training_walkthrough.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.pruning import two_stage_2ssp
from ssp_x_vit_tpu.llm.train import make_llama_train_step

SEQ = 64


def batches(stream, b, s, steps, seed=0):
    """Deterministic [b, s] token batches sampled from the stream."""
    rng = np.random.default_rng(seed)
    n = len(stream) - s - 1
    for _ in range(steps):
        starts = rng.integers(0, n, b)
        yield np.stack([stream[i : i + s] for i in starts]).astype(np.int32)


def train(params, cfg, stream, steps, lr=3e-3, label=""):
    opt = optax.adamw(lr)
    step = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    opt_state = opt.init(params)
    for i, toks in enumerate(batches(stream, 8, SEQ, steps)):
        params, opt_state, loss = step(params, opt_state, toks)
        if i % 20 == 0 or i == steps - 1:
            print(f"  [{label}] step {i:3d}  loss {float(loss):.4f}")
    return params


def main():
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, num_layers=4,
                      num_heads=4, num_kv_heads=2, intermediate_size=128)
    # synthetic but LEARNABLE: a deterministic markov-ish stream, so training
    # and the pruning-recovery effect are visible in perplexity
    # hold out the TAIL of the same stream (a different seed generates an
    # unrelated synthetic distribution — training would look like divergence)
    full = synthetic_token_stream(48_000, cfg.vocab_size, seed=0).reshape(-1)
    stream, heldout = full[:40_000], full[40_000:]

    print("1) pretrain from scratch on the synthetic stream")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = train(params, cfg, stream, steps=60, label="pretrain")
    ppl_dense = evaluate_perplexity(params, cfg, heldout, seq_len=SEQ)
    print(f"   dense perplexity: {ppl_dense:.2f}")

    print("2) 2SSP prune to 37.5% sparsity")
    calib = [stream[i * SEQ : (i + 1) * SEQ] for i in range(4)]
    pruned, pcfg, info = two_stage_2ssp(params, cfg, calib, 0.375, seq_len=SEQ)
    ppl_pruned = evaluate_perplexity(pruned, pcfg, heldout, seq_len=SEQ)
    print(f"   pruned perplexity (no recovery): {ppl_pruned:.2f}")

    print("3) recovery finetune of the pruned model (same train step API)")
    pruned = train(pruned, pcfg, stream, steps=60, label="recover")
    ppl_rec = evaluate_perplexity(pruned, pcfg, heldout, seq_len=SEQ)
    print(f"   recovered perplexity: {ppl_rec:.2f}")

    assert ppl_rec < ppl_pruned, "recovery finetune should improve the pruned model"
    print(f"\nsummary: dense {ppl_dense:.2f} -> pruned {ppl_pruned:.2f} "
          f"-> recovered {ppl_rec:.2f}")


if __name__ == "__main__":
    main()
