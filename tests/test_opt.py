"""OPT family: sequential LayerNorm block, learned positions, ReLU MLP,
2SSP compatibility (reference src/slicegpt_utils/adapters/opt_adapter.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import (
    LlamaConfig, init_llama_params, llama_forward, llama_forward_materialized,
)
from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream, get_calibration
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.llm import pruning as P

OPT = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
                  num_kv_heads=4, intermediate_size=64, model_type="opt",
                  qkv_bias=True, tie_embeddings=True, max_position_embeddings=256)


@pytest.fixture(scope="module")
def opt():
    return init_llama_params(jax.random.PRNGKey(0), OPT, dtype=jnp.float32), OPT


def test_opt_forward_and_causality(opt):
    params, cfg = opt
    t1 = jnp.asarray(np.arange(16, dtype=np.int32)[None] % cfg.vocab_size)
    logits, _ = llama_forward(params, t1, cfg, compute_dtype=jnp.float32)
    assert logits.shape == (1, 16, cfg.vocab_size)
    t2 = t1.at[0, -1].set(7)
    l2, _ = llama_forward(params, t2, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits[0, :-1]), np.asarray(l2[0, :-1]),
                               rtol=1e-5, atol=1e-5)


def test_opt_gate_matches_materialized(opt):
    params, cfg = opt
    tokens = jnp.asarray(np.arange(16, dtype=np.int32)[None] % cfg.vocab_size)
    gate = jnp.ones((cfg.num_layers,)).at[2].set(0.0)
    gated, _ = llama_forward(params, tokens, cfg, attn_gate=gate, compute_dtype=jnp.float32)
    mp, mc = P.materialize_llm_depth_pruning(params, cfg, [2])
    mat = llama_forward_materialized(mp, tokens, mc, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(mat), rtol=1e-4, atol=1e-4)
    # OPT's pre-attention LN belongs to the attention branch -> repacked
    assert mp["blocks"]["ln1"].shape[0] == cfg.num_layers - 1
    assert mp["blocks"]["ln2"].shape[0] == cfg.num_layers


def test_opt_two_stage_2ssp(opt):
    params, cfg = opt
    stream = synthetic_token_stream(2048, cfg.vocab_size, seed=0)
    calib = get_calibration(stream, 3, seq_len=128)
    out = P.two_stage_2ssp(params, cfg, calib, 0.25, seq_len=128)
    assert out is not False
    p2, c2, info = out
    main_b, _, _ = P.count_main_params(cfg)
    main_a, _, _ = P.count_main_params(c2)
    assert abs((main_b - main_a) / main_b - 0.25) < 0.06
    ppl = evaluate_perplexity(p2, c2, stream, seq_len=128, enable_tqdm=False)
    assert np.isfinite(ppl)


def test_opt_width_materialization_preserves_function(opt):
    params, cfg = opt
    tokens = jnp.asarray(np.arange(32, dtype=np.int32)[None] % cfg.vocab_size)
    keep = [np.sort(np.random.default_rng(i).permutation(cfg.intermediate_size)[:32])
            for i in range(cfg.num_layers)]
    nmask = np.zeros((cfg.num_layers, cfg.intermediate_size), np.float32)
    for i, k in enumerate(keep):
        nmask[i, k] = 1.0
    masked, _ = llama_forward(params, tokens, cfg, neuron_mask=jnp.asarray(nmask),
                              compute_dtype=jnp.float32)
    mp, mc = P.materialize_llm_width_pruning(params, cfg, keep)
    mat, _ = llama_forward(mp, tokens, mc, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(mat), rtol=1e-4, atol=1e-4)
