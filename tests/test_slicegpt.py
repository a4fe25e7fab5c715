"""SliceGPT: losslessness at 0% sparsity (rotation-only), sanity at 25%."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward
from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream, get_calibration
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.llm.slicegpt import (
    slicegpt, sliced_llama_forward, evaluate_perplexity_sliced, rmsn, fuse_layernorms,
)

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=4, intermediate_size=64, rms_eps=1e-5)


@pytest.fixture(scope="module")
def setup():
    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    stream = synthetic_token_stream(2048, CFG.vocab_size, seed=0)
    calib = get_calibration(stream, 3, seq_len=128)
    return params, stream, calib


def test_rotation_only_is_lossless(setup):
    """new_dim == hidden (sparsity 0): pure orthogonal rotations must
    reproduce the dense model's logits."""
    params, stream, calib = setup
    sliced, scfg = slicegpt(params, CFG, 0.0, calib, final_orientation="pca")
    assert scfg.new_dim == CFG.hidden_size
    tokens = jnp.asarray(np.asarray(calib[0]), jnp.int32)
    dense_logits, _ = llama_forward(params, tokens, CFG, compute_dtype=jnp.float32)
    sliced_logits = sliced_llama_forward(sliced, tokens, scfg)
    # fp32 capture + f64 rotations: small numeric drift only. Note the RMSN
    # eps differs from the model's rms_eps in general; CFG pins 1e-5 to match.
    np.testing.assert_allclose(np.asarray(sliced_logits), np.asarray(dense_logits),
                               rtol=5e-3, atol=5e-3)


def test_sliced_ppl_close_at_zero_sparsity(setup):
    params, stream, calib = setup
    sliced, scfg = slicegpt(params, CFG, 0.0, calib, final_orientation="random")
    dense_ppl = evaluate_perplexity(params, CFG, stream, seq_len=128, enable_tqdm=False)
    sliced_ppl = evaluate_perplexity_sliced(sliced, scfg, stream, seq_len=128)
    assert abs(np.log(sliced_ppl) - np.log(dense_ppl)) < 0.05


def test_sparsity_25_runs_and_shrinks(setup):
    params, stream, calib = setup
    sliced, scfg = slicegpt(params, CFG, 0.25, calib)
    assert scfg.new_dim == 24  # (1-0.25)*32 = 24, already /8
    lp = sliced["layers"][0]
    assert lp["q_kernel"].shape[0] == 24
    assert lp["attn_shortcut"].shape == (24, 24)
    # last layer keeps full output dim (do_slice_head=False)
    assert sliced["layers"][-1]["down_kernel"].shape[1] == CFG.hidden_size
    ppl = evaluate_perplexity_sliced(sliced, scfg, stream, seq_len=128)
    assert np.isfinite(ppl) and ppl > 0


PHI = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=4, intermediate_size=64, model_type="phi",
                  qkv_bias=True, rotary_dim=4, layer_norm_eps=1e-5)


@pytest.fixture(scope="module")
def phi_setup():
    params = init_llama_params(jax.random.PRNGKey(3), PHI, dtype=jnp.float32)
    stream = synthetic_token_stream(2048, PHI.vocab_size, seed=1)
    calib = get_calibration(stream, 3, seq_len=128)
    return params, stream, calib


def test_phi_rotation_only_is_lossless(phi_setup):
    """phi-2 parallel-residual engine: LayerNorm->RMSN fusion + single-Q
    rotations at 0% sparsity reproduce the dense phi logits
    (reference rotate.py:255-358, adapters/phi2_adapter.py)."""
    params, stream, calib = phi_setup
    sliced, scfg = slicegpt(params, PHI, 0.0, calib, final_orientation="pca")
    assert scfg.new_dim == PHI.hidden_size
    tokens = jnp.asarray(np.asarray(calib[0]), jnp.int32)
    dense_logits, _ = llama_forward(params, tokens, PHI, compute_dtype=jnp.float32)
    sliced_logits = sliced_llama_forward(sliced, tokens, scfg)
    np.testing.assert_allclose(np.asarray(sliced_logits), np.asarray(dense_logits),
                               rtol=5e-3, atol=5e-3)


def test_phi_sparsity_25_runs_and_shrinks(phi_setup):
    params, stream, calib = phi_setup
    sliced, scfg = slicegpt(params, PHI, 0.25, calib)
    assert scfg.new_dim == 24
    lp = sliced["layers"][0]
    assert lp["q_kernel"].shape[0] == 24
    assert lp["fc1_kernel"].shape[0] == 24
    # parallel block: ONE shortcut matrix, no mlp_shortcut
    assert "mlp_shortcut" not in lp
    assert lp["attn_shortcut"].shape == (24, 24)
    assert sliced["layers"][-1]["fc2_kernel"].shape[1] == PHI.hidden_size
    ppl = evaluate_perplexity_sliced(sliced, scfg, stream, seq_len=128)
    assert np.isfinite(ppl) and ppl > 0


OPT = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=4, intermediate_size=64, model_type="opt",
                  qkv_bias=True, layer_norm_eps=1e-5,
                  max_position_embeddings=256, tie_embeddings=True)


@pytest.fixture(scope="module")
def opt_setup():
    params = init_llama_params(jax.random.PRNGKey(5), OPT, dtype=jnp.float32)
    stream = synthetic_token_stream(2048, OPT.vocab_size, seed=2)
    calib = get_calibration(stream, 3, seq_len=128)
    return params, stream, calib


def test_opt_rotation_only_is_lossless(opt_setup):
    """OPT sequential engine: LayerNorm->RMSN fusion (mean baked into the
    residual writers), rotated positional embeddings, two-Q rotations at 0%
    sparsity reproduce the dense OPT logits (reference
    adapters/opt_adapter.py, rotate.py rotate_and_slice_sequential)."""
    params, stream, calib = opt_setup
    sliced, scfg = slicegpt(params, OPT, 0.0, calib, final_orientation="pca")
    assert scfg.new_dim == OPT.hidden_size
    tokens = jnp.asarray(np.asarray(calib[0]), jnp.int32)
    dense_logits, _ = llama_forward(params, tokens, OPT, compute_dtype=jnp.float32)
    sliced_logits = sliced_llama_forward(sliced, tokens, scfg)
    np.testing.assert_allclose(np.asarray(sliced_logits), np.asarray(dense_logits),
                               rtol=5e-3, atol=5e-3)


def test_opt_sparsity_25_runs_and_shrinks(opt_setup):
    params, stream, calib = opt_setup
    sliced, scfg = slicegpt(params, OPT, 0.25, calib)
    assert scfg.new_dim == 24
    lp = sliced["layers"][0]
    assert lp["q_kernel"].shape[0] == 24
    assert lp["fc1_kernel"].shape[0] == 24
    assert lp["attn_shortcut"].shape == (24, 24)
    assert lp["mlp_shortcut"].shape == (24, 24)
    assert sliced["pos_embed"].shape[1] == 24
    assert sliced["layers"][-1]["fc2_kernel"].shape[1] == OPT.hidden_size
    ppl = evaluate_perplexity_sliced(sliced, scfg, stream, seq_len=128)
    assert np.isfinite(ppl) and ppl > 0
