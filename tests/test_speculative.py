"""Self-speculative decoding: exact greedy equivalence with the dense model
(llm/speculative.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.serve import generate_kv_scan
from ssp_x_vit_tpu.llm.speculative import speculative_generate

CFG = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


@pytest.fixture(scope="module")
def models():
    from ssp_x_vit_tpu.llm import pruning as P

    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    keep = [np.sort(np.random.default_rng(i).permutation(CFG.intermediate_size)[:32])
            for i in range(CFG.num_layers)]
    dp, dc = P.materialize_llm_width_pruning(params, CFG, keep)
    dp, dc = P.materialize_llm_depth_pruning(dp, dc, [2])
    return params, CFG, dp, dc


@pytest.mark.parametrize("k", [1, 3, 5])
def test_spec_equals_dense_greedy_pruned_draft(models, k):
    """Draft = 2SSP-pruned model: output must STILL equal dense greedy
    exactly, whatever the draft proposes."""
    dense, dcfg, draft, dracfg = models
    for seed, plen in ((0, 5), (1, 12)):
        prompt = np.random.default_rng(seed).integers(1, 100, plen)
        ref = generate_kv_scan(dense, dcfg, np.asarray(prompt, np.int32),
                               max_length=plen + 17, cache_dtype=jnp.float32)
        out, stats = speculative_generate(
            dense, dcfg, draft, dracfg, prompt, max_length=plen + 17, k=k,
            cache_dtype=jnp.float32)
        np.testing.assert_array_equal(out, np.asarray(ref))
        assert stats["rounds"] >= 1


def test_spec_with_self_draft_accepts_everything(models):
    """Draft == dense: every proposal verifies, rounds ~= steps / (k+1)."""
    dense, dcfg, _, _ = models
    prompt = np.arange(1, 9)
    max_length, k = 8 + 24, 4
    ref = generate_kv_scan(dense, dcfg, np.asarray(prompt, np.int32),
                           max_length=max_length, cache_dtype=jnp.float32)
    out, stats = speculative_generate(
        dense, dcfg, dense, dcfg, prompt, max_length=max_length, k=k,
        cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))
    assert stats["acceptance_rate"] > 0.99
    # STRICT optimum: every round accepts all k+1 tokens. A draft-cache hole
    # after a fully-accepted round (the bug fixed in draft_k) breaks this.
    steps = max_length - len(prompt)
    assert stats["rounds"] == -(-(steps - 1) // (k + 1))


def test_spec_eos_trimming(models):
    dense, dcfg, draft, dracfg = models
    prompt = np.asarray([3, 7, 11])
    ref = generate_kv_scan(dense, dcfg, np.asarray(prompt, np.int32),
                           max_length=20, cache_dtype=jnp.float32)
    eos = int(np.asarray(ref)[len(prompt) + 2])  # force a mid-stream "eos"
    ref_trim = generate_kv_scan(dense, dcfg, np.asarray(prompt, np.int32),
                                max_length=20, eos_token_id=eos,
                                cache_dtype=jnp.float32)
    out, _ = speculative_generate(dense, dcfg, draft, dracfg, prompt,
                                  max_length=20, k=3, eos_token_id=eos,
                                  cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref_trim))


def test_spec_phi_layout():
    """phi-2 parallel-residual models work as target AND draft (speculative
    reuses serve's layer step, which handles the phi branch)."""
    cfg = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=3,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      model_type="phi", qkv_bias=True, rotary_dim=4)
    params = init_llama_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    prompt = np.asarray([2, 4, 6, 8], np.int32)
    ref = generate_kv_scan(params, cfg, prompt, max_length=20,
                           cache_dtype=jnp.float32)
    out, stats = speculative_generate(params, cfg, params, cfg, prompt,
                                      max_length=20, k=3,
                                      cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))
    assert stats["acceptance_rate"] > 0.99
