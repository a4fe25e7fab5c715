"""KV-cached decoding equals full-recompute greedy decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward
from ssp_x_vit_tpu.llm.generate import greedy_generate
from ssp_x_vit_tpu.llm.serve import greedy_generate_kv, init_cache, prefill, decode_step

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


@pytest.fixture(scope="module")
def llm():
    return init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32), CFG


def test_prefill_logits_match_full_forward(llm):
    params, cfg = llm
    prompt = np.asarray([5, 9, 2, 7], np.int32)
    max_len = 16
    ck, cv = init_cache(cfg, 1, max_len, jnp.float32)
    toks = np.zeros((1, max_len), np.int32)
    toks[0, : len(prompt)] = prompt
    last, ck, cv = prefill(params, jnp.asarray(toks), ck, cv, cfg,
                           jnp.asarray(len(prompt), jnp.int32))

    full, _ = llama_forward(params, jnp.asarray(prompt[None]), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(last[0]), np.asarray(full[0, -1]),
                               rtol=2e-4, atol=2e-4)


def test_decode_step_matches_full_forward(llm):
    params, cfg = llm
    seq = np.asarray([5, 9, 2, 7, 11], np.int32)
    max_len = 16
    ck, cv = init_cache(cfg, 1, max_len, jnp.float32)
    toks = np.zeros((1, max_len), np.int32)
    toks[0, :4] = seq[:4]
    _, ck, cv = prefill(params, jnp.asarray(toks), ck, cv, cfg,
                        jnp.asarray(4, jnp.int32))
    step_logits, ck, cv = decode_step(params, jnp.asarray(seq[4:5]), ck, cv, cfg,
                                      jnp.asarray(4, jnp.int32))
    full, _ = llama_forward(params, jnp.asarray(seq[None]), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(step_logits[0]), np.asarray(full[0, -1]),
                               rtol=2e-4, atol=2e-4)


def test_kv_generation_matches_recompute(llm):
    params, cfg = llm
    prompt = np.asarray([1, 2, 3], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=14, no_repeat_ngram_size=0)
    kv = greedy_generate_kv(params, cfg, prompt, max_length=14, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(ref, kv)


def test_kv_rejects_unsupported(llm):
    params, cfg = llm
    import dataclasses

    phi_cfg = dataclasses.replace(cfg, model_type="phi")
    with pytest.raises(NotImplementedError):
        greedy_generate_kv(params, phi_cfg, np.asarray([1]), max_length=8)


def test_scan_generation_matches_loop(llm):
    from ssp_x_vit_tpu.llm.serve import greedy_generate_kv_scan

    params, cfg = llm
    prompt = np.asarray([4, 8, 15], np.int32)
    loop = greedy_generate_kv(params, cfg, prompt, max_length=14, cache_dtype=jnp.float32)
    scan = greedy_generate_kv_scan(params, cfg, prompt, max_length=14, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(loop, scan)
