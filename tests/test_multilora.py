"""Multi-LoRA serving (llm/multilora.py): per-request adapters in one batched
decode equal per-adapter merged models served alone."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.lora import init_lora, merge_lora
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.multilora import attach_lora_bank, build_lora_bank
from ssp_x_vit_tpu.llm.serve import generate_kv_scan, pack_llm_params_for_serving

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


def _random_adapter(seed, params, rank=4):
    """init_lora zeros b (identity); give b random values so it binds."""
    ad = init_lora(jax.random.PRNGKey(seed), params, rank=rank)
    ks = iter(jax.random.split(jax.random.PRNGKey(seed + 100), len(ad)))
    return {t: {"a": ab["a"],
                "b": jax.random.normal(next(ks), ab["b"].shape,
                                       jnp.float32) * 0.05}
            for t, ab in ad.items()}


@pytest.fixture(scope="module")
def setup():
    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    adapters = [_random_adapter(1, params), _random_adapter(2, params)]
    bank = build_lora_bank(adapters, alpha=16.0)
    return params, adapters, bank


def test_multilora_batch_matches_merged_singles(setup):
    """One batched generation with ids [0 (base), 1, 2] == three separate
    generations: base params, merge_lora(adapter_0), merge_lora(adapter_1)."""
    params, adapters, bank = setup
    served = attach_lora_bank(params, bank)
    prompts = [np.asarray([3, 1, 4, 1, 5], np.int32)] * 3
    outs = generate_kv_scan(served, CFG, prompts, max_length=16,
                            cache_dtype=jnp.float32,
                            lora_ids=np.asarray([0, 1, 2], np.int32))

    ref0 = generate_kv_scan(params, CFG, prompts[0], max_length=16,
                            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(outs[0], np.asarray(ref0))
    for i, ad in enumerate(adapters):
        merged = merge_lora(params, ad, alpha=16.0)
        ref = generate_kv_scan(merged, CFG, prompts[0], max_length=16,
                               cache_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(outs[i + 1]), np.asarray(ref))
    # adapters actually bind: rows differ from base past the prompt
    assert not np.array_equal(outs[1], outs[0])


def test_multilora_on_packed_params(setup):
    """Bank deltas add after the packed qkv split — packed serving params
    with per-request adapters == unpacked."""
    params, adapters, bank = setup
    served = attach_lora_bank(params, bank)
    packed = pack_llm_params_for_serving(served, CFG)
    assert any(k.startswith("qkv_kernel") for k in packed["blocks"])
    prompts = [np.asarray([7, 2, 9], np.int32)] * 2
    ids = np.asarray([1, 2], np.int32)
    a = generate_kv_scan(served, CFG, prompts, max_length=14,
                         cache_dtype=jnp.float32, lora_ids=ids)
    b = generate_kv_scan(packed, CFG, prompts, max_length=14,
                         cache_dtype=jnp.float32, lora_ids=ids)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_multilora_on_quantized_base(setup):
    """Bank rides an int8-quantized base (attach after quantization; the
    float adapters correct the quantized projections per request)."""
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8

    params, adapters, bank = setup
    q = attach_lora_bank(quantize_llm_params_int8(params, CFG), bank)
    prompts = [np.asarray([5, 6, 7], np.int32)] * 2
    outs = generate_kv_scan(q, CFG, prompts, max_length=12,
                            cache_dtype=jnp.float32,
                            lora_ids=np.asarray([0, 1], np.int32))
    base_q = generate_kv_scan(quantize_llm_params_int8(params, CFG), CFG,
                              prompts[0], max_length=12,
                              cache_dtype=jnp.float32)
    np.testing.assert_array_equal(outs[0], np.asarray(base_q))
    assert not np.array_equal(outs[1], outs[0])


def test_bank_identity_slot_and_validation(setup):
    params, adapters, bank = setup
    assert bank["q_kernel_lora_a"].shape[1] == len(adapters) + 1
    assert float(jnp.abs(bank["q_kernel_lora_a"][:, 0]).max()) == 0.0
    with pytest.raises(ValueError):
        build_lora_bank([])
    with pytest.raises(ValueError):
        attach_lora_bank({"blocks": {"zz_kernel": jnp.zeros((2, 4, 4))}},
                         bank)


def test_bank_refuses_mlp_targets(setup):
    """MLP-target adapters would attach cleanly but be silently ignored by
    the decode (deltas apply on q/k/v/o only) — refused at build."""
    params, _, _ = setup
    ad = init_lora(jax.random.PRNGKey(9), params, rank=2,
                   targets=("gate_kernel", "up_kernel"))
    with pytest.raises(ValueError, match="silently ignored"):
        build_lora_bank([ad])
