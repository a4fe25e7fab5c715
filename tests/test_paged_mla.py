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
    MLAPagedServer, init_mla_pool, mla_paged_decode_step, mla_paged_generate,
    mla_paged_prefill, mla_paged_prefill_chunked,
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
    with pytest.raises(ValueError, match="ONE latent pool"):
        MLAPagedServer(params, cfg,
                       cache_dtype={"k": jnp.int8, "v": jnp.int8})


def test_mla_chunked_prefill_matches_whole(model):
    """Offset-aware chunked MLA prefill (fixed C-token chunks attending
    over the latent pages) must equal the whole-prompt prefill: greedy
    generations match exactly at f32, prompt lengths hitting mid-chunk
    tails, sub-chunk prompts, and exact multiples."""
    params, cfg = model
    prompts = [np.arange(11) % 64 + 1,          # 2 chunks of 4 + tail 3
               np.asarray([9, 3]),              # shorter than one chunk
               np.arange(8) % 64 + 1]           # exact chunk multiple
    ref_srv = MLAPagedServer(params, cfg, max_batch=4, num_pages=32,
                             page_size=4, max_context=64,
                             cache_dtype=jnp.float32)
    chk_srv = MLAPagedServer(params, cfg, max_batch=4, num_pages=32,
                             page_size=4, max_context=64,
                             cache_dtype=jnp.float32, chunked_prefill=4)
    ref_ids = [ref_srv.add_request(p, max_new_tokens=8) for p in prompts]
    chk_ids = [chk_srv.add_request(p, max_new_tokens=8) for p in prompts]
    ref_outs, chk_outs = ref_srv.run(), chk_srv.run()
    for r, c in zip(ref_ids, chk_ids):
        np.testing.assert_array_equal(ref_outs[r], chk_outs[c])


def test_mla_prefix_cache_reuse_and_exactness(model):
    """Automatic prefix caching over latent pages: a second prompt sharing
    a page-aligned prefix reuses the registered pages and generations
    equal an uncached MLA server's exactly (latents are a function of the
    token prefix + absolute positions only)."""
    params, cfg = model
    shared = (np.arange(16) % 64 + 1).tolist()          # 4 full pages, ps=4
    p1, p2 = shared + [7, 8, 9], shared + [11, 12]
    srv = MLAPagedServer(params, cfg, max_batch=2, num_pages=48, page_size=4,
                         max_context=64, cache_dtype=jnp.float32,
                         prefix_cache=True)
    r1 = srv.add_request(p1, max_new_tokens=8)
    assert srv.prefix_hit_pages == 0
    r2 = srv.add_request(p2, max_new_tokens=8)
    assert srv.prefix_hit_pages == 4                    # whole shared prefix
    outs = srv.run()
    ref = MLAPagedServer(params, cfg, max_batch=2, num_pages=48, page_size=4,
                         max_context=64, cache_dtype=jnp.float32)
    for p, rid in zip((p1, p2), (r1, r2)):
        rr = ref.add_request(p, max_new_tokens=8)
        np.testing.assert_array_equal(outs[rid], ref.run()[rr])


def test_mla_chunked_prefill_int8_pool():
    """int8 latent pages under chunked prefill are lossy TWICE — later
    chunks attend over already-quantized earlier pages, unlike the
    whole-prompt MLA prefill whose attention is in-graph and exact — so
    (unlike the llama pools, where BOTH paths attend over the written
    pages) int8 chunked == whole does NOT hold for MLA. Pin a logit bound
    vs the bf16-pool chunked run (same bf16 compute; the delta isolates
    quantization), plus the server running end-to-end."""
    cfg = _cfg()
    params = init_deepseek_params(jax.random.PRNGKey(2), cfg)
    prompt = np.arange(10) % 64 + 1
    pt = np.zeros(16, np.int32)
    pt[:3] = [1, 2, 3]
    out = {}
    for dtype in (jnp.bfloat16, jnp.int8):
        pool = init_mla_pool(cfg, 32, 4, dtype)
        lg, _ = mla_paged_prefill_chunked(params, prompt, pool, cfg, pt,
                                          chunk_size=4)
        out[str(dtype)] = np.asarray(lg)
    np.testing.assert_allclose(out[str(jnp.int8)], out[str(jnp.bfloat16)],
                               atol=0.08)

    srv = MLAPagedServer(params, cfg, max_batch=1, num_pages=32, page_size=4,
                         max_context=64, cache_dtype=jnp.int8,
                         chunked_prefill=4)
    free0 = len(srv.free_pages)
    rid = srv.add_request(prompt, max_new_tokens=6)
    res = srv.run()[rid]
    assert len(srv.free_pages) == free0
    assert res.shape == (16,)
    assert np.all((0 <= res) & (res < cfg.vocab_size))


def test_mla_int8_pool_structure():
    cfg = _cfg()
    pool = init_mla_pool(cfg, 8, 4, jnp.int8)
    D = cfg.kv_lora_rank + cfg.qk_rope_head_dim
    assert pool["q"].shape == (3, 1, 8, 4, D) and pool["q"].dtype == jnp.int8
    assert pool["s"].shape == (3, 1, 8, 4) and pool["s"].dtype == jnp.float32


def test_mla_int8_pool_decode_logits_close():
    """Quantized latent pages are lossy, so the pin is a logit error bound:
    after identical prefill, one decode step over the int8 pool must land
    near the bf16-pool logits (both run bf16 compute — the delta isolates
    the per-token cat(c, k_rot) quantization)."""
    cfg = _cfg()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(np.asarray([[5, 1, 2, 9, 11, 4, 0, 0]], np.int32))
    pt = np.asarray([1, 2, 3, 0], np.int32)
    out = {}
    for dtype in (jnp.bfloat16, jnp.int8):
        pool = init_mla_pool(cfg, 8, 4, dtype)
        _, pool = mla_paged_prefill(params, toks, pool, cfg,
                                    jnp.asarray(pt), jnp.asarray(6, jnp.int32))
        lg, _ = mla_paged_decode_step(params, jnp.asarray([3], jnp.int32),
                                      pool, cfg, jnp.asarray(pt[None]),
                                      jnp.asarray([6], jnp.int32))
        out[str(dtype)] = np.asarray(lg)
    np.testing.assert_allclose(out[str(jnp.int8)], out[str(jnp.bfloat16)],
                               atol=0.08)


def test_mla_int8_pool_generation(model):
    """End-to-end int8-pool serving: the FIRST generated token comes from
    the prefill full forward (pool-independent), so it equals the
    bf16-pool run exactly; the rest must be valid ids of the right length
    (greedy equality is NOT guaranteed under quantization)."""
    params, cfg = model
    prompts = [np.arange(5) % 64 + 1, np.asarray([7, 9])]
    out8 = mla_paged_generate(params, cfg, prompts, max_new_tokens=6,
                              page_size=4, cache_dtype=jnp.int8)
    outb = mla_paged_generate(params, cfg, prompts, max_new_tokens=6,
                              page_size=4, cache_dtype=jnp.bfloat16)
    for p, o8, ob in zip(prompts, out8, outb):
        assert o8.shape == ob.shape
        assert o8[len(p)] == ob[len(p)]
        assert np.all((0 <= o8) & (o8 < cfg.vocab_size))


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


def test_mla_step_many_matches_step(model):
    """MLA masked multi-step decode (one latent pool) == step-per-dispatch,
    with eos + mixed budgets and full page return."""
    params, cfg = model
    prompts = [np.arange(5) % 60 + 1, np.asarray([7, 9]),
               np.arange(9) % 60 + 1]
    budgets = [11, 3, 7]

    def run(block):
        srv = MLAPagedServer(params, cfg, max_batch=3, num_pages=48,
                             page_size=4, max_context=64)
        ids = [srv.add_request(p, max_new_tokens=nb, eos_token_id=0)
               for p, nb in zip(prompts, budgets)]
        while srv.step_many(block) if block > 1 else srv.step():
            pass
        assert len(srv.free_pages) == 47
        return [srv.finished[r] for r in ids]

    for a, b in zip(run(1), run(5)):
        np.testing.assert_array_equal(a, b)
