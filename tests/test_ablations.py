"""Ablation suite: one-stage, inverted, L1 variants on the tiny LLM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward
from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream, get_calibration
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.llm import ablations as A
from ssp_x_vit_tpu.llm import pruning as P

CFG = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
                  num_kv_heads=4, intermediate_size=64)


@pytest.fixture(scope="module")
def setup():
    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    stream = synthetic_token_stream(4096, CFG.vocab_size, seed=0)
    calib = get_calibration(stream, 4, seq_len=128)
    return params, stream, calib


def test_one_stage_2ssp(setup):
    params, stream, calib = setup
    p2, c2 = A.one_stage_2ssp(params, CFG, calib, 0.25)
    main_b, _, _ = P.count_main_params(CFG)
    main_a, _, _ = P.count_main_params(c2)
    achieved = (main_b - main_a) / main_b
    assert abs(achieved - 0.25) < 0.05
    assert not c2.pruned_attention_blocks  # stage-1 only: no depth pruning
    ppl = evaluate_perplexity(p2, c2, stream, seq_len=128, enable_tqdm=False)
    assert np.isfinite(ppl)


def test_inverted_masking_is_exact(setup):
    """Zeroed gate/up rows == slicing inputs; zeroed down cols == scatter."""
    params, _, _ = setup
    rng = np.random.default_rng(0)
    keep_in = [np.sort(rng.permutation(CFG.hidden_size)[:24]) for _ in range(CFG.num_layers)]
    keep_out = [np.sort(rng.permutation(CFG.hidden_size)[:24]) for _ in range(CFG.num_layers)]
    masked = A.materialize_inverted_mlp_pruning(params, CFG, keep_in, keep_out)

    tokens = jnp.asarray(np.arange(32, dtype=np.int32)[None] % CFG.vocab_size)
    out, _ = llama_forward(masked, tokens, CFG, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()

    # manual check on block 0: masked gate kernel rows outside keep_in are 0
    g = np.asarray(masked["blocks"]["gate_kernel"][0])
    zero_rows = np.setdiff1d(np.arange(CFG.hidden_size), keep_in[0])
    assert np.all(g[zero_rows] == 0.0)
    d = np.asarray(masked["blocks"]["down_kernel"][0])
    zero_cols = np.setdiff1d(np.arange(CFG.hidden_size), keep_out[0])
    assert np.all(d[:, zero_cols] == 0.0)


def test_two_stage_inverted_runs(setup):
    params, stream, calib = setup
    out = A.two_stage_2ssp_inverted(params, CFG, calib, 0.25, seq_len=128)
    assert out is not False
    p2, c2, info = out
    assert len(info["pruned_attention_blocks"]) >= 1
    ppl = evaluate_perplexity(p2, c2, stream, seq_len=128, enable_tqdm=False)
    assert np.isfinite(ppl)


def test_two_stage_l1_runs(setup):
    params, stream, calib = setup
    out = A.two_stage_2ssp_l1_norm(params, CFG, calib, 0.25, seq_len=128)
    assert out is not False
    p2, c2, info = out
    main_b, _, _ = P.count_main_params(CFG)
    main_a, _, _ = P.count_main_params(c2)
    assert abs((main_b - main_a) / main_b - 0.25) < 0.05
    ppl = evaluate_perplexity(p2, c2, stream, seq_len=128, enable_tqdm=False)
    assert np.isfinite(ppl)


def test_balancing_sweep(setup):
    params, stream, calib = setup
    res = A.ablation_balancing_sparsity_ratio(params, CFG, 0.25, calib, stream, seq_len=128)
    assert len(res) >= 1
    assert all(np.isfinite(r["ppl"]) for r in res)
