"""Paged KV cache: attention parity, continuous-batching server correctness,
page allocation/reuse (ops/pallas/paged_attention.py, llm/paged.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.ops.pallas.paged_attention import (
    paged_attention_reference, paged_cache_write,
)
from ssp_x_vit_tpu.llm.paged import PagedServer
from ssp_x_vit_tpu.llm.serve import generate_kv_scan

CFG = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


def test_paged_attention_matches_dense():
    """Paged gather attention over shuffled pages == contiguous softmax
    attention, for ragged per-sequence lengths."""
    b, nq, nkv, hd, ps, mp, P = 3, 4, 2, 8, 4, 4, 16
    rng = np.random.default_rng(0)
    seq_lens = np.asarray([5, 16, 1], np.int32)
    q = rng.normal(size=(b, nq, hd)).astype(np.float32)
    kc = rng.normal(size=(b, nkv, mp * ps, hd)).astype(np.float32)
    vc = rng.normal(size=(b, nkv, mp * ps, hd)).astype(np.float32)

    # scatter the contiguous caches into a shuffled page pool
    k_pages = np.zeros((nkv, P, ps, hd), np.float32)
    v_pages = np.zeros((nkv, P, ps, hd), np.float32)
    pt = np.zeros((b, mp), np.int32)
    free = list(range(1, P))
    rng.shuffle(free)
    for i in range(b):
        for j in range(mp):
            pg = free.pop()
            pt[i, j] = pg
            k_pages[:, pg] = kc[i, :, j * ps:(j + 1) * ps]
            v_pages[:, pg] = vc[i, :, j * ps:(j + 1) * ps]

    out = paged_attention_reference(jnp.asarray(q), jnp.asarray(k_pages),
                                    jnp.asarray(v_pages), jnp.asarray(pt),
                                    jnp.asarray(seq_lens))
    # dense reference per sequence
    rep = nq // nkv
    for i in range(b):
        L = int(seq_lens[i])
        kf = np.repeat(kc[i][:, :L], rep, axis=0)   # [nq, L, hd]
        vf = np.repeat(vc[i][:, :L], rep, axis=0)
        sc = np.einsum("hd,hld->hl", q[i] / np.sqrt(hd), kf)
        w = np.exp(sc - sc.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        ref = np.einsum("hl,hld->hd", w, vf)
        np.testing.assert_allclose(np.asarray(out[i]), ref, atol=1e-5, rtol=1e-4)


def test_paged_cache_write_roundtrip():
    b, nkv, hd, ps, P, mp = 2, 2, 8, 4, 8, 2
    kp = jnp.zeros((nkv, P, ps, hd))
    vp = jnp.zeros((nkv, P, ps, hd))
    pt = jnp.asarray([[3, 5], [1, 0]], jnp.int32)
    pos = jnp.asarray([5, 2], jnp.int32)   # seq0 -> page 5 off 1; seq1 -> page 1 off 2
    k_new = jnp.arange(b * nkv * hd, dtype=jnp.float32).reshape(b, nkv, hd)
    kp, vp = paged_cache_write(kp, vp, k_new, k_new * 2, pt, pos)
    np.testing.assert_allclose(np.asarray(kp[:, 5, 1]), np.asarray(k_new[0]))
    np.testing.assert_allclose(np.asarray(kp[:, 1, 2]), np.asarray(k_new[1]))
    np.testing.assert_allclose(np.asarray(vp[:, 1, 2]), np.asarray(k_new[1] * 2))
    assert float(jnp.abs(kp[:, 0]).sum()) == 0.0  # untouched pages stay zero


@pytest.fixture(scope="module")
def model():
    return init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32), CFG


def test_paged_server_matches_contiguous(model):
    """Greedy paged decode == the contiguous-cache scan decode, for a batch
    of different-length prompts admitted together."""
    params, cfg = model
    prompts = [np.arange(5) % 64 + 1, np.arange(11) % 64 + 1, np.asarray([7, 9])]
    budgets = [8, 8, 8]

    srv = PagedServer(params, cfg, max_batch=4, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.float32)
    ids = [srv.add_request(p, max_new_tokens=nb) for p, nb in zip(prompts, budgets)]
    outs = srv.run()

    for p, nb, rid in zip(prompts, budgets, ids):
        ref = generate_kv_scan(params, cfg, np.asarray(p, np.int32),
                               max_length=len(p) + nb, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(outs[rid], np.asarray(ref))


def test_paged_server_continuous_batching_and_reuse(model):
    """A request admitted mid-flight decodes correctly, and completed
    requests' pages return to the pool."""
    params, cfg = model
    srv = PagedServer(params, cfg, max_batch=2, num_pages=24, page_size=4,
                      max_context=48, cache_dtype=jnp.float32)
    free0 = len(srv.free_pages)
    a = srv.add_request(np.asarray([3, 5, 8]), max_new_tokens=10)
    for _ in range(4):
        srv.step()
    b = srv.add_request(np.asarray([2, 4, 6, 8, 10]), max_new_tokens=6)
    srv.run()

    assert len(srv.free_pages) == free0  # all pages returned
    ref_a = generate_kv_scan(params, cfg, np.asarray([3, 5, 8], np.int32),
                             max_length=13, cache_dtype=jnp.float32)
    ref_b = generate_kv_scan(params, cfg, np.asarray([2, 4, 6, 8, 10], np.int32),
                             max_length=11, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(srv.finished[a], np.asarray(ref_a))
    np.testing.assert_array_equal(srv.finished[b], np.asarray(ref_b))


def test_paged_generate_scan_matches_contiguous(model):
    """Bulk paged scan generation (one dispatch) == contiguous scan decode."""
    from ssp_x_vit_tpu.llm.paged import paged_generate

    params, cfg = model
    prompts = [np.arange(7) % 64 + 1, np.asarray([4, 2]), np.arange(13) % 64 + 1]
    outs = paged_generate(params, cfg, prompts, max_new_tokens=9,
                          page_size=4, cache_dtype=jnp.float32)
    for p, out in zip(prompts, outs):
        ref = generate_kv_scan(params, cfg, np.asarray(p, np.int32),
                               max_length=len(p) + 9, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(out, np.asarray(ref))


def test_paged_generate_phi(model):
    """phi-2 parallel block through the paged path == contiguous decode."""
    phi = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=3, num_heads=4,
                      num_kv_heads=4, intermediate_size=64, model_type="phi",
                      rotary_dim=4, qkv_bias=True)
    params = init_llama_params(jax.random.PRNGKey(3), phi, dtype=jnp.float32)
    from ssp_x_vit_tpu.llm.paged import paged_generate

    prompts = [np.arange(6) % 64 + 1, np.asarray([9, 3, 5])]
    outs = paged_generate(params, phi, prompts, max_new_tokens=7,
                          page_size=4, cache_dtype=jnp.float32)
    for p, out in zip(prompts, outs):
        ref = generate_kv_scan(params, phi, np.asarray(p, np.int32),
                               max_length=len(p) + 7, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(out, np.asarray(ref))


def test_paged_generate_pruned(model):
    """Depth+width materialized pruned model through the paged path ==
    contiguous decode (pool rows only for surviving attention)."""
    from ssp_x_vit_tpu.llm import pruning as P
    from ssp_x_vit_tpu.llm.paged import paged_generate

    params, cfg = model
    keep = [np.sort(np.random.default_rng(i).permutation(cfg.intermediate_size)[:32])
            for i in range(cfg.num_layers)]
    mp_, mc = P.materialize_llm_width_pruning(params, cfg, keep)
    mp_, mc = P.materialize_llm_depth_pruning(mp_, mc, [1])

    prompts = [np.arange(5) % 64 + 1, np.asarray([11, 2, 4, 8])]
    outs = paged_generate(mp_, mc, prompts, max_new_tokens=6,
                          page_size=4, cache_dtype=jnp.float32)
    for p, out in zip(prompts, outs):
        ref = generate_kv_scan(mp_, mc, np.asarray(p, np.int32),
                               max_length=len(p) + 6, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(out, np.asarray(ref))


def test_server_admission_reserves_worst_case(model):
    """Admission must account for ACTIVE slots' worst-case growth — a second
    request that would overcommit the pool is rejected at admit time, never
    mid-decode (code-review finding, round 2)."""
    params, cfg = model
    srv = PagedServer(params, cfg, max_batch=2, num_pages=9, page_size=8,
                      max_context=64, cache_dtype=jnp.float32)
    # worst = ceil((2 + 30)/8) = 4 pages; usable pool = 8
    srv.add_request([1, 2], max_new_tokens=30)
    with pytest.raises(RuntimeError, match="exhausted"):
        srv.add_request([3, 4], max_new_tokens=38)  # worst 5 > 8 - 4 unreserved
    # a small request that fits the unreserved remainder is admitted
    srv.add_request([5], max_new_tokens=10)  # worst 2 <= 8 - 4
    while srv.step():
        pass
    assert len(srv.finished) == 2


def test_paged_generate_zero_and_one_new_tokens(model):
    params, cfg = model
    from ssp_x_vit_tpu.llm.paged import paged_generate

    outs = paged_generate(params, cfg, [[5, 9, 2]], max_new_tokens=0,
                          page_size=8, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(outs[0], [5, 9, 2])
    outs = paged_generate(params, cfg, [[5, 9, 2]], max_new_tokens=1,
                          page_size=8, cache_dtype=jnp.float32)
    assert outs[0].shape == (4,)


def test_paged_attention_start_lens_masks_window():
    """start_lens masks keys below the bound — matches a dense softmax over
    only the [start, len) slice (sliding-window decode mask)."""
    b, nq, nkv, hd, ps, mp, P = 2, 4, 2, 8, 4, 4, 12
    rng = np.random.default_rng(1)
    seq_lens = np.asarray([14, 9], np.int32)
    start_lens = np.asarray([6, 0], np.int32)
    q = rng.normal(size=(b, nq, hd)).astype(np.float32)
    kc = rng.normal(size=(b, nkv, mp * ps, hd)).astype(np.float32)
    vc = rng.normal(size=(b, nkv, mp * ps, hd)).astype(np.float32)
    k_pages = np.zeros((nkv, P, ps, hd), np.float32)
    v_pages = np.zeros((nkv, P, ps, hd), np.float32)
    pt = np.zeros((b, mp), np.int32)
    nxt = 1
    for i in range(b):
        for j in range(mp):
            pt[i, j] = nxt
            k_pages[:, nxt] = kc[i, :, j * ps:(j + 1) * ps]
            v_pages[:, nxt] = vc[i, :, j * ps:(j + 1) * ps]
            nxt += 1

    out = paged_attention_reference(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(pt), jnp.asarray(seq_lens), jnp.asarray(start_lens))
    rep = nq // nkv
    for i in range(b):
        lo, hi = int(start_lens[i]), int(seq_lens[i])
        kf = np.repeat(kc[i][:, lo:hi], rep, axis=0)
        vf = np.repeat(vc[i][:, lo:hi], rep, axis=0)
        sc = np.einsum("hd,hld->hl", q[i] / np.sqrt(hd), kf)
        w = np.exp(sc - sc.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        ref = np.einsum("hl,hld->hd", w, vf)
        np.testing.assert_allclose(np.asarray(out[i]), ref, atol=1e-5, rtol=1e-4)


def test_paged_server_sliding_window_matches_contiguous():
    """Mistral-style SWA through the paged server == the contiguous-cache
    scan decode (both mask the same global-index window band)."""
    cfg = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=64,
                      model_type="mistral", sliding_window=6)
    params = init_llama_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    prompts = [np.arange(9) % 64 + 1, np.asarray([5, 3, 8])]

    srv = PagedServer(params, cfg, max_batch=2, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.float32)
    ids = [srv.add_request(p, max_new_tokens=12) for p in prompts]
    outs = srv.run()

    for p, rid in zip(prompts, ids):
        ref = generate_kv_scan(params, cfg, np.asarray(p, np.int32),
                               max_length=len(p) + 12, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(outs[rid], np.asarray(ref))


def test_chunked_prefill_matches_whole(model):
    """Chunked prefill (fixed C-token chunks over the paged cache) must
    produce the SAME first-token logits and pools as the whole-prompt
    prefill: greedy generations through a chunked-prefill server equal the
    whole-prefill server's, with prompt lengths hitting mid-chunk tails."""
    params, cfg = model
    prompts = [np.arange(11) % 64 + 1,          # 11 = 2 chunks of 4 + tail 3
               np.asarray([9, 3]),              # shorter than one chunk
               np.arange(8) % 64 + 1]           # exact chunk multiple
    ref_srv = PagedServer(params, cfg, max_batch=4, num_pages=32, page_size=4,
                          max_context=64, cache_dtype=jnp.float32)
    chk_srv = PagedServer(params, cfg, max_batch=4, num_pages=32, page_size=4,
                          max_context=64, cache_dtype=jnp.float32,
                          chunked_prefill=4)
    ref_ids = [ref_srv.add_request(p, max_new_tokens=8) for p in prompts]
    chk_ids = [chk_srv.add_request(p, max_new_tokens=8) for p in prompts]
    ref_outs, chk_outs = ref_srv.run(), chk_srv.run()
    for r, c in zip(ref_ids, chk_ids):
        np.testing.assert_array_equal(ref_outs[r], chk_outs[c])


def test_chunked_prefill_int8_and_sliding_window():
    """Chunked prefill composes with int8 pools and sliding-window configs
    (same per-token quantizer as whole prefill -> identical codes; window
    band applied at global positions across chunks)."""
    cfg = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=64,
                      model_type="mistral", sliding_window=6)
    params = init_llama_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    prompt = np.arange(10) % 64 + 1
    for dtype in (jnp.float32, jnp.int8):
        ref_srv = PagedServer(params, cfg, max_batch=1, num_pages=32,
                              page_size=4, max_context=64, cache_dtype=dtype)
        chk_srv = PagedServer(params, cfg, max_batch=1, num_pages=32,
                              page_size=4, max_context=64, cache_dtype=dtype,
                              chunked_prefill=4)
        r = ref_srv.add_request(prompt, max_new_tokens=10)
        c = chk_srv.add_request(prompt, max_new_tokens=10)
        np.testing.assert_array_equal(ref_srv.run()[r], chk_srv.run()[c])


def test_prefix_cache_reuse_and_exactness(model):
    """Automatic prefix caching: a second prompt sharing a page-aligned
    prefix reuses the registered pages (counted in prefix_hit_pages) and the
    generations equal an uncached server's exactly — including after the
    first request FINISHED (its prefix pages stay cached until evicted)."""
    params, cfg = model
    shared = (np.arange(16) % 64 + 1).tolist()          # 4 full pages at ps=4
    p1, p2, p3 = shared + [7, 8, 9], shared + [11, 12], shared[:10]

    srv = PagedServer(params, cfg, max_batch=2, num_pages=48, page_size=4,
                      max_context=64, cache_dtype=jnp.float32,
                      prefix_cache=True)
    r1 = srv.add_request(p1, max_new_tokens=8)
    assert srv.prefix_hit_pages == 0
    r2 = srv.add_request(p2, max_new_tokens=8)
    assert srv.prefix_hit_pages == 4                    # whole shared prefix
    outs = srv.run()
    r3 = srv.add_request(p3, max_new_tokens=8)          # after r1/r2 finished
    assert srv.prefix_hit_pages == 6                    # 10 tokens -> 2 pages
    outs.update(srv.run())

    ref = PagedServer(params, cfg, max_batch=2, num_pages=48, page_size=4,
                      max_context=64, cache_dtype=jnp.float32)
    for p, rid in zip((p1, p2, p3), (r1, r2, r3)):
        rr = ref.add_request(p, max_new_tokens=8)
        np.testing.assert_array_equal(outs[rid], ref.run()[rr])


def test_prefix_cache_exact_page_multiple_keeps_one_token(model):
    """A fully cached prompt still computes at least its last page so the
    first-token logits exist (reuse capped at (len-1)//ps)."""
    params, cfg = model
    p = (np.arange(12) % 64 + 1).tolist()               # exactly 3 pages
    srv = PagedServer(params, cfg, max_batch=1, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.float32,
                      prefix_cache=True)
    r1 = srv.add_request(p, max_new_tokens=6)
    out1 = srv.run()[r1]
    r2 = srv.add_request(p, max_new_tokens=6)
    assert srv.prefix_hit_pages == 2                    # 3rd page recomputed
    np.testing.assert_array_equal(srv.run()[r2], out1)


def test_prefix_cache_eviction_under_pressure(model):
    """When the free list empties, cached-but-unreferenced pages are evicted
    LRU to serve new requests; results stay exact."""
    params, cfg = model
    srv = PagedServer(params, cfg, max_batch=1, num_pages=12, page_size=4,
                      max_context=32, cache_dtype=jnp.float32,
                      prefix_cache=True)
    outs = {}
    prompts = [(np.arange(8) % 64 + i).tolist() for i in range(5)]
    for p in prompts:                                   # 11 usable pages;
        rid = srv.add_request(p, max_new_tokens=6)      # each run caches 2,
        outs[rid] = (p, srv.run()[rid])                 # peak demand 4
    assert len(srv._registry) < 2 * len(prompts)        # eviction happened
    ref = PagedServer(params, cfg, max_batch=1, num_pages=12, page_size=4,
                      max_context=32, cache_dtype=jnp.float32)
    for p, got in outs.values():
        rr = ref.add_request(p, max_new_tokens=6)
        np.testing.assert_array_equal(got, ref.run()[rr])


def test_prefix_cache_int8_pools(model):
    """Prefix caching over int8 pools: reused codes are identical to a fresh
    quantization of the same tokens, so generations match uncached int8."""
    params, cfg = model
    shared = (np.arange(12) % 64 + 1).tolist()
    p1, p2 = shared + [5], shared + [9, 2]
    srv = PagedServer(params, cfg, max_batch=2, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.int8, prefix_cache=True)
    r1, r2 = (srv.add_request(p, max_new_tokens=6) for p in (p1, p2))
    assert srv.prefix_hit_pages == 3
    outs = srv.run()
    ref = PagedServer(params, cfg, max_batch=2, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.int8)
    for p, rid in zip((p1, p2), (r1, r2)):
        rr = ref.add_request(p, max_new_tokens=6)
        np.testing.assert_array_equal(outs[rid], ref.run()[rr])


def test_prefix_cache_admission_counts_reused_lru_pages(model):
    """Reused pages that were sitting in the LRU stop being evictable at
    admit; counting them as capacity would overcommit the pool and kill the
    server mid-decode. The admission check must refuse instead."""
    params, cfg = model
    srv = PagedServer(params, cfg, max_batch=1, num_pages=6, page_size=4,
                      max_context=32, cache_dtype=jnp.float32,
                      prefix_cache=True)
    a = (np.arange(16) % 64 + 1).tolist()       # 4 full pages, all cached
    r = srv.add_request(a, max_new_tokens=2)    # worst 5 of 5 usable pages
    srv.run()
    assert len(srv._lru) == 4 and len(srv.free_pages) == 1
    with pytest.raises(RuntimeError, match="page pool exhausted"):
        # m=4 reused (leaves LRU), worst=6: only 1 truly free page remains
        # for the 2 fresh pages decode will need -> must refuse at ADMIT
        srv.add_request(a + [9], max_new_tokens=7)
    # and a request that does fit still works exactly
    r2 = srv.add_request(a + [9], max_new_tokens=2)
    out = srv.run()[r2]
    ref = PagedServer(params, cfg, max_batch=1, num_pages=8, page_size=4,
                      max_context=32, cache_dtype=jnp.float32)
    rr = ref.add_request(a + [9], max_new_tokens=2)
    np.testing.assert_array_equal(out, ref.run()[rr])


# ---------------- per-request sampling (vectorized sampler) ----------------

def test_paged_per_request_sampling_isolated_rows(model):
    """A greedy slot decoding NEXT TO a heavily penalized slot is unaffected
    (per-row state isolation), and the penalized slot matches the contiguous
    path with the same SamplingParams (greedy + penalties = deterministic)."""
    from ssp_x_vit_tpu.llm.sampling import SamplingParams

    params, cfg = model
    plain = np.asarray([5, 6, 7, 8], np.int32)
    pen = np.asarray([9, 2, 9], np.int32)
    sp = SamplingParams(repetition_penalty=1.3, presence_penalty=0.4)

    srv = PagedServer(params, cfg, max_batch=2, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.float32)
    r_plain = srv.add_request(plain, max_new_tokens=10)
    r_pen = srv.add_request(pen, max_new_tokens=10, sampling=sp)
    outs = srv.run()

    ref_plain = generate_kv_scan(params, cfg, plain, max_length=14,
                                 cache_dtype=jnp.float32)
    np.testing.assert_array_equal(outs[r_plain], np.asarray(ref_plain))
    ref_pen = generate_kv_scan(params, cfg, pen, max_length=13,
                               cache_dtype=jnp.float32, sampling=sp)
    np.testing.assert_array_equal(outs[r_pen], np.asarray(ref_pen))


def test_paged_neutral_sampling_equals_greedy(model):
    """Activating the sampler with all-default params reproduces the host
    argmax path exactly."""
    from ssp_x_vit_tpu.llm.sampling import SamplingParams

    params, cfg = model
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    a = PagedServer(params, cfg, max_batch=2, num_pages=32, page_size=4,
                    max_context=64, cache_dtype=jnp.float32)
    ra = a.add_request(prompt, max_new_tokens=12)
    b = PagedServer(params, cfg, max_batch=2, num_pages=32, page_size=4,
                    max_context=64, cache_dtype=jnp.float32)
    rb = b.add_request(prompt, max_new_tokens=12,
                       sampling=SamplingParams())
    np.testing.assert_array_equal(a.run()[ra], b.run()[rb])


def test_paged_per_request_seeds_reproducible(model):
    """Same seed -> identical stochastic generation; the slot row is reset
    at admit so a SECOND request reusing the slot with the same seed also
    reproduces."""
    from ssp_x_vit_tpu.llm.sampling import SamplingParams

    params, cfg = model
    prompt = np.asarray([7, 11, 13], np.int32)
    sp = SamplingParams(temperature=0.9, top_k=20)

    def run_once(seed):
        srv = PagedServer(params, cfg, max_batch=2, num_pages=32,
                          page_size=4, max_context=64,
                          cache_dtype=jnp.float32)
        rid = srv.add_request(prompt, max_new_tokens=12, sampling=sp,
                              seed=seed)
        return srv.run()[rid]

    one, two = run_once(42), run_once(42)
    np.testing.assert_array_equal(one, two)

    # slot reuse: same server, sequential requests, same seed
    srv = PagedServer(params, cfg, max_batch=1, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.float32)
    r1 = srv.add_request(prompt, max_new_tokens=12, sampling=sp, seed=42)
    srv.run()
    r2 = srv.add_request(prompt, max_new_tokens=12, sampling=sp, seed=42)
    srv.run()
    np.testing.assert_array_equal(srv.finished[r1], srv.finished[r2])
    assert not np.array_equal(np.asarray(one), np.asarray(run_once(7)))


def _drain(srv, block):
    """Run the server to completion via step_many(block) (block=1 -> step)."""
    while srv.step_many(block) if block > 1 else srv.step():
        pass
    return dict(srv.finished)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_step_many_matches_step(model, dtype):
    """step_many (N decode steps per host dispatch, in-graph alive masking)
    emits EXACTLY the tokens of the step-per-dispatch loop: mixed budgets,
    an eos that fires mid-block, and a slot finishing while others run."""
    params, cfg = model
    prompts = [np.arange(5) % 64 + 1, np.asarray([7, 9]),
               np.arange(9) % 64 + 1]
    budgets = [13, 3, 7]        # 13 crosses a block boundary; 3 dies mid-block

    def run(block):
        srv = PagedServer(params, cfg, max_batch=4, num_pages=48,
                          page_size=4, max_context=64, cache_dtype=dtype)
        ids = [srv.add_request(p, max_new_tokens=nb, eos_token_id=0)
               for p, nb in zip(prompts, budgets)]
        outs = _drain(srv, block)
        assert len(srv.free_pages) == 47  # all pages back (page 0 = trash)
        return [outs[r] for r in ids]

    ref, blk = run(1), run(6)
    for a, b in zip(ref, blk):
        np.testing.assert_array_equal(a, b)


def test_step_many_staggered_admission(model):
    """Requests admitted BETWEEN blocks join correctly: the block path's
    page pre-own + masked scan must not disturb live slots' state."""
    params, cfg = model
    srv = PagedServer(params, cfg, max_batch=3, num_pages=48, page_size=4,
                      max_context=64, cache_dtype=jnp.float32)
    a = srv.add_request(np.asarray([3, 5, 8]), max_new_tokens=14)
    srv.step_many(4)
    b = srv.add_request(np.asarray([2, 4, 6, 8, 10]), max_new_tokens=6)
    srv.step_many(4)
    c = srv.add_request(np.asarray([11, 13]), max_new_tokens=9)
    while srv.step_many(4):
        pass
    for rid, prompt, nb in ((a, [3, 5, 8], 14), (b, [2, 4, 6, 8, 10], 6),
                            (c, [11, 13], 9)):
        ref = generate_kv_scan(params, cfg, np.asarray(prompt, np.int32),
                               max_length=len(prompt) + nb,
                               cache_dtype=jnp.float32)
        np.testing.assert_array_equal(srv.finished[rid], np.asarray(ref))


def test_step_many_sampling_seed_reproducible(model):
    """Per-request stochastic sampling through the masked multi-step scan:
    same seed -> same tokens across block sizes is NOT required (RNG cadence
    differs), but the block path itself must be self-reproducible."""
    from ssp_x_vit_tpu.llm.sampling import SamplingParams

    params, cfg = model
    sp = SamplingParams(temperature=0.9, top_k=20)

    def run_once():
        srv = PagedServer(params, cfg, max_batch=2, num_pages=32,
                          page_size=4, max_context=64,
                          cache_dtype=jnp.float32)
        rid = srv.add_request(np.asarray([7, 11, 13]), max_new_tokens=12,
                              sampling=sp, seed=42)
        while srv.step_many(5):
            pass
        return srv.finished[rid]

    np.testing.assert_array_equal(run_once(), run_once())
