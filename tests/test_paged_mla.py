"""MLA paged serving (llm/paged_mla.py): compressed-latent page pool.

Exactness is pinned against deepseek_generate (itself pinned against the
full-recompute forward in test_deepseek.py): the absorbed decode rides the
GENERIC paged-attention contract as 1-kv-head attention over cat(c, k_rot)
pages with the same pool as keys AND values (see the module docstring's
linearity argument), so greedy tokens must match exactly at f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.deepseek import (
    DeepseekConfig, deepseek_generate, init_deepseek_params,
)
from ssp_x_vit_tpu.llm.paged_mla import (
    MLAPagedServer, mla_paged_generate,
)
from ssp_x_vit_tpu.llm.rope import RopeScaling


def _cfg(**kw):
    base = dict(vocab_size=64, hidden_size=16, num_layers=3, num_heads=2,
                kv_lora_rank=8, qk_nope_head_dim=4, qk_rope_head_dim=4,
                v_head_dim=4, intermediate_size=24, n_routed_experts=0)
    base.update(kw)
    return DeepseekConfig(**base)


@pytest.fixture(scope="module", params=["dense", "moe_qlora", "yarn"])
def model(request):
    if request.param == "dense":
        cfg = _cfg()
    elif request.param == "yarn":
        # deepseek-style yarn: scaled cos/sin AND the mscale_all_dim softmax
        # temperature must thread identically through prefill (full forward)
        # and the kernel's pre-multiplied q_cat scale correction
        cfg = _cfg(rope_scaling=RopeScaling(
            rope_type="yarn", factor=4.0, mscale=1.2, mscale_all_dim=0.8,
            original_max_position_embeddings=16))
    else:
        cfg = _cfg(n_routed_experts=4, n_shared_experts=1,
                   num_experts_per_tok=2, first_k_dense_replace=1,
                   moe_intermediate_size=12, q_lora_rank=8,
                   routed_scaling_factor=1.5)
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_mla_paged_generate_matches_whole(model):
    """Ragged prompts through the paged server == per-prompt whole-cache
    absorbed decode, greedy at f32."""
    params, cfg = model
    prompts = [np.arange(5) % 64 + 1, np.asarray([7, 9]),
               np.arange(9) % 64 + 1]
    outs = mla_paged_generate(params, cfg, prompts, max_new_tokens=7,
                              page_size=4, cache_dtype=jnp.float32)
    for p, out in zip(prompts, outs):
        ref = deepseek_generate(params, cfg, np.asarray(p, np.int32),
                                max_new_tokens=7, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(out, np.asarray(ref))


def test_mla_server_continuous_batching_and_page_reuse(model):
    """A request admitted mid-flight decodes correctly; finished requests
    return every page to the pool."""
    params, cfg = model
    srv = MLAPagedServer(params, cfg, max_batch=2, num_pages=24, page_size=4,
                         max_context=48, cache_dtype=jnp.float32)
    free0 = len(srv.free_pages)
    a = srv.add_request(np.asarray([3, 5, 8]), max_new_tokens=8)
    for _ in range(3):
        srv.step()
    b = srv.add_request(np.asarray([2, 4, 6, 8, 10]), max_new_tokens=5)
    srv.run()

    assert len(srv.free_pages) == free0
    ref_a = deepseek_generate(params, cfg, np.asarray([3, 5, 8], np.int32),
                              max_new_tokens=8, compute_dtype=jnp.float32)
    ref_b = deepseek_generate(params, cfg,
                              np.asarray([2, 4, 6, 8, 10], np.int32),
                              max_new_tokens=5, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(srv.finished[a], np.asarray(ref_a))
    np.testing.assert_array_equal(srv.finished[b], np.asarray(ref_b))


def test_mla_server_eos_stops(model):
    """eos produced mid-generation finishes the request early (inherited
    server logic over the MLA hooks)."""
    params, cfg = model
    ref = deepseek_generate(params, cfg, np.asarray([5, 1, 2], np.int32),
                            max_new_tokens=10, compute_dtype=jnp.float32)
    eos = int(ref[4])  # second generated token -> stop after it
    srv = MLAPagedServer(params, cfg, max_batch=1, num_pages=16, page_size=4,
                         max_context=32, cache_dtype=jnp.float32)
    rid = srv.add_request(np.asarray([5, 1, 2]), max_new_tokens=10,
                          eos_token_id=eos)
    out = srv.run()[rid]
    assert out.tolist() == ref[:5].tolist()


def test_mla_server_refusals(model):
    params, cfg = model
    with pytest.raises(ValueError, match="chunked_prefill"):
        MLAPagedServer(params, cfg, chunked_prefill=8)
    with pytest.raises(ValueError, match="chunked_prefill"):
        MLAPagedServer(params, cfg, prefix_cache=True)
    with pytest.raises(ValueError, match="int8"):
        MLAPagedServer(params, cfg, cache_dtype=jnp.int8)


def test_engine_serves_mla(model):
    """The threaded ServingEngine (and therefore the HTTP frontend) serves
    DeepSeek configs through MLAPagedServer transparently."""
    from ssp_x_vit_tpu.llm.engine import ServingEngine

    params, cfg = model
    ref = deepseek_generate(params, cfg, np.asarray([4, 9, 2], np.int32),
                            max_new_tokens=6, compute_dtype=jnp.float32)
    with ServingEngine(params, cfg, max_batch=2, num_pages=16, page_size=4,
                       max_context=32, cache_dtype=jnp.float32) as eng:
        h = eng.submit([4, 9, 2], max_new_tokens=6)
        toks = h.result(timeout=300)
    assert toks == ref[3:].tolist()
