"""Invariants on the COMMITTED trained checkpoints (VERDICT r4 #3/#5).

ckpts/code_llm_small: a small code-LM trained in-repo (Makefile
reproduce-trained-llm-small) with its exact train/val token slices committed
alongside, so these tests measure real trained weights — not random init —
on every CI run.

The speculative exactness invariant is the round-4 triage outcome: at
f32/highest, speculative greedy == plain greedy EXACTLY (any divergence is
a real bug); at bf16 the bitstreams may differ only via argmax near-ties
(docs/tpu_notes.md), which is why the invariant is pinned at f32.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "ckpts", "code_llm_small")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(CKPT, "train_meta.json")),
    reason="committed trained checkpoint not present")


@pytest.fixture(scope="module")
def trained():
    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model

    params, cfg = load_llm_model(CKPT)
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    val = np.memmap(os.path.join(CKPT, "corpus_slice", "val.bin"),
                    np.uint16, "r")
    return params, cfg, np.asarray(val, np.int32)


def test_trained_ppl_matches_pinned(trained):
    """Held-out ppl on the committed val slice reproduces train_meta.json's
    pinned value (±5% — bf16 matmul nondeterminism across backends)."""
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity

    params, cfg, val = trained
    with open(os.path.join(CKPT, "train_meta.json")) as f:
        meta = json.load(f)
    ppl = float(evaluate_perplexity(params, cfg, val[:16384], seq_len=1024,
                                    batch_size=2, enable_tqdm=False))
    pinned = meta["val_ppl_16k"]
    assert abs(ppl - pinned) / pinned < 0.05, (ppl, pinned)


def test_spec_exact_f32_highest_on_trained_weights(trained):
    """Speculative greedy == dense greedy, bit-exact, on trained weights at
    f32/highest — the invariant the bf16 near-tie divergence is NOT allowed
    to hide behind."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    params, cfg, val = trained
    prompt = val[:32]
    M = 80
    with jax.default_matmul_precision("highest"):
        dense = np.asarray(generate_kv_scan(
            params, cfg, prompt, max_length=M, cache_dtype=jnp.float32))
        spec, stats = speculative_generate(
            params, cfg, params, cfg, prompt, max_length=M, k=4,
            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(spec)[:M], dense[:M])
    assert stats["acceptance_rate"] > 0.95  # self-draft at full precision


def test_trained_weights_quantization_sanity(trained):
    """int8 weight-only ppl within 2% of dense on real trained weights."""
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8

    params, cfg, val = trained
    ids = val[:8192]
    dense = float(evaluate_perplexity(params, cfg, ids, seq_len=1024,
                                      batch_size=2, enable_tqdm=False))
    q8 = quantize_llm_params_int8(params, cfg)
    quant = float(evaluate_perplexity(q8, cfg, ids, seq_len=1024,
                                      batch_size=2, enable_tqdm=False))
    assert abs(quant - dense) / dense < 0.02, (dense, quant)
