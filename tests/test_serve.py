"""KV-cached decoding equals full-recompute greedy decoding — including
batched prompts, phi-2 layout, depth-materialized pruned models, and
temperature sampling (round-2 serve hardening)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward
from ssp_x_vit_tpu.llm.generate import greedy_generate
from ssp_x_vit_tpu.llm.serve import (
    bucket_prompt_pad, decode_step, generate_kv_scan, greedy_generate_kv,
    greedy_generate_kv_scan, init_cache, prefill,
)

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


@pytest.fixture(scope="module")
def llm():
    return init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32), CFG


def test_prefill_logits_match_full_forward(llm):
    params, cfg = llm
    prompt = np.asarray([5, 9, 2, 7], np.int32)
    p_pad = 16
    ck, cv = init_cache(cfg, 1, p_pad, jnp.float32)
    toks = np.zeros((1, p_pad), np.int32)
    toks[0, p_pad - len(prompt):] = prompt  # LEFT-padded
    last, ck, cv = prefill(params, jnp.asarray(toks), ck, cv, cfg,
                           jnp.asarray([p_pad - len(prompt)], jnp.int32))

    full, _ = llama_forward(params, jnp.asarray(prompt[None]), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(last[0]), np.asarray(full[0, -1]),
                               rtol=2e-4, atol=2e-4)


def test_decode_step_matches_full_forward(llm):
    params, cfg = llm
    seq = np.asarray([5, 9, 2, 7, 11], np.int32)
    p_pad = 16
    ck, cv = init_cache(cfg, 1, p_pad + 4, jnp.float32)
    toks = np.zeros((1, p_pad), np.int32)
    toks[0, p_pad - 4:] = seq[:4]
    pad_lens = jnp.asarray([p_pad - 4], jnp.int32)
    _, ck, cv = prefill(params, jnp.asarray(toks), ck, cv, cfg, pad_lens)
    step_logits, ck, cv = decode_step(params, jnp.asarray(seq[4:5]), ck, cv, cfg,
                                      jnp.asarray(p_pad, jnp.int32), pad_lens)
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


def test_scan_generation_matches_loop(llm):
    params, cfg = llm
    prompt = np.asarray([4, 8, 15], np.int32)
    loop = greedy_generate_kv(params, cfg, prompt, max_length=14, cache_dtype=jnp.float32)
    scan = greedy_generate_kv_scan(params, cfg, prompt, max_length=14, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(loop, scan)


def test_batched_generation_matches_single(llm):
    """b=3 prompts of DIFFERENT lengths: each batched output must equal its
    single-prompt generation (left-pad + per-sequence rope correctness)."""
    params, cfg = llm
    prompts = [[1, 2, 3], [7, 11, 13, 17, 19], [42]]
    batched = greedy_generate_kv(params, cfg, prompts, max_length=12,
                                 cache_dtype=jnp.float32)
    assert len(batched) == 3
    for p, out in zip(prompts, batched):
        single = greedy_generate_kv(params, cfg, np.asarray(p, np.int32),
                                    max_length=12, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(out, single)

    scan_batched = greedy_generate_kv_scan(params, cfg, prompts, max_length=12,
                                           cache_dtype=jnp.float32)
    for a, b in zip(batched, scan_batched):
        np.testing.assert_array_equal(a, b)


def test_eos_stops_each_sequence(llm):
    params, cfg = llm
    prompt = np.asarray([1, 2, 3], np.int32)
    full = greedy_generate_kv(params, cfg, prompt, max_length=16,
                              cache_dtype=jnp.float32)
    eos = int(full[5])  # force an early "eos" we know will be generated
    out = greedy_generate_kv(params, cfg, prompt, max_length=16,
                             eos_token_id=eos, cache_dtype=jnp.float32)
    assert len(out) == 6 and out[-1] == eos
    out2 = generate_kv_scan(params, cfg, prompt, max_length=16,
                            eos_token_id=eos, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, out2)


def test_phi_layout_kv_matches_recompute():
    """phi-2 parallel-residual block (LayerNorm, biases, partial rotary)
    decodes correctly through the KV path (was NotImplementedError in r1)."""
    phi_cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3,
                          num_heads=4, num_kv_heads=4, intermediate_size=64,
                          model_type="phi", qkv_bias=True, rotary_dim=4)
    params = init_llama_params(jax.random.PRNGKey(1), phi_cfg, dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4], np.int32)
    ref = greedy_generate(params, phi_cfg, prompt, max_length=12,
                          no_repeat_ngram_size=0)
    kv = greedy_generate_kv(params, phi_cfg, prompt, max_length=12,
                            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(ref, kv)


def test_depth_pruned_model_kv_matches_recompute(llm):
    """Depth-materialized model (attention physically removed from one block)
    decodes through the KV path (the pruned-model speedup is the point of the
    framework; was NotImplementedError in r1)."""
    from ssp_x_vit_tpu.llm.pruning import materialize_llm_depth_pruning

    params, cfg = llm
    pp, pc = materialize_llm_depth_pruning(params, cfg, [1])
    prompt = np.asarray([9, 8, 7], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=12,
                          no_repeat_ngram_size=0, )
    del ref  # dense reference not comparable; compare vs materialized forward
    ref_mat = greedy_generate(pp, pc, prompt, max_length=12, no_repeat_ngram_size=0)
    kv = greedy_generate_kv(pp, pc, prompt, max_length=12, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(ref_mat, kv)
    scan = greedy_generate_kv_scan(pp, pc, prompt, max_length=12,
                                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(ref_mat, scan)


def test_sampling_deterministic_and_valid(llm):
    params, cfg = llm
    prompt = np.asarray([5, 6], np.int32)
    rng = jax.random.PRNGKey(42)
    a = generate_kv_scan(params, cfg, prompt, max_length=12, temperature=0.8,
                         top_k=8, rng=rng, cache_dtype=jnp.float32)
    b = generate_kv_scan(params, cfg, prompt, max_length=12, temperature=0.8,
                         top_k=8, rng=rng, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(a, b)  # same rng -> same sample
    assert len(a) == 12 and a.min() >= 0 and a.max() < cfg.vocab_size
    c = generate_kv_scan(params, cfg, prompt, max_length=12, temperature=0.8,
                         top_k=8, rng=jax.random.PRNGKey(7), cache_dtype=jnp.float32)
    assert not np.array_equal(a, c)  # different rng -> (overwhelmingly) different


def test_prompt_buckets():
    assert bucket_prompt_pad(3) == 32
    assert bucket_prompt_pad(33) == 64
    assert bucket_prompt_pad(2048) == 2048
    assert bucket_prompt_pad(2049) == 2176  # next /128 multiple


def test_packed_serving_matches_unpacked(llm):
    """pack_llm_params_for_serving (fused qkv + gateup matmuls) produces
    IDENTICAL greedy generations — column concatenation commutes with the
    contraction; also on int8-quantized pytrees (codes+scales concatenate)."""
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
    from ssp_x_vit_tpu.llm.serve import pack_llm_params_for_serving

    params, cfg = llm
    prompt = np.asarray([4, 8, 15, 16], np.int32)
    ref = generate_kv_scan(params, cfg, prompt, max_length=16,
                           cache_dtype=jnp.float32)
    packed = pack_llm_params_for_serving(params, cfg)
    assert "qkv_kernel" in packed["blocks"] and "q_kernel" not in packed["blocks"]
    out = generate_kv_scan(packed, cfg, prompt, max_length=16,
                           cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    qp = quantize_llm_params_int8(params, cfg)
    ref_q = generate_kv_scan(qp, cfg, prompt, max_length=16,
                             cache_dtype=jnp.float32)
    packed_q = pack_llm_params_for_serving(qp, cfg)
    assert "qkv_kernel_q" in packed_q["blocks"]
    out_q = generate_kv_scan(packed_q, cfg, prompt, max_length=16,
                             cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref_q), np.asarray(out_q))


OPT_CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      model_type="opt", qkv_bias=True, tie_embeddings=True,
                      max_position_embeddings=64)


@pytest.fixture(scope="module")
def opt():
    return init_llama_params(jax.random.PRNGKey(2), OPT_CFG,
                             dtype=jnp.float32), OPT_CFG


def test_opt_kv_matches_recompute(opt):
    """OPT (learned absolute positions, biased LayerNorms, ReLU MLP) decodes
    correctly through the KV-cached path — was a loud refusal in r2
    (VERDICT r2 #3; reference adapters/opt_adapter.py:1)."""
    params, cfg = opt
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=14,
                          no_repeat_ngram_size=0)
    kv = greedy_generate_kv(params, cfg, prompt, max_length=14,
                            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(ref, kv)
    scan = greedy_generate_kv_scan(params, cfg, prompt, max_length=14,
                                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(ref, scan)


def test_opt_batched_left_pad_positions(opt):
    """Batched OPT prompts of different lengths: the learned position table
    must be indexed at pad-CORRECTED positions, so each batched output equals
    its single-prompt generation."""
    params, cfg = opt
    prompts = [[1, 2, 3], [7, 11, 13, 17, 19], [42]]
    batched = greedy_generate_kv(params, cfg, prompts, max_length=12,
                                 cache_dtype=jnp.float32)
    for p, out in zip(prompts, batched):
        single = greedy_generate_kv(params, cfg, np.asarray(p, np.int32),
                                    max_length=12, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(out, single)


def test_opt_depth_pruned_kv_matches_recompute(opt):
    """OPT with attention materialized away in one block (ln1/ln1_bias ride
    with the attention branch) through the KV path."""
    from ssp_x_vit_tpu.llm.pruning import materialize_llm_depth_pruning

    params, cfg = opt
    pp, pc = materialize_llm_depth_pruning(params, cfg, [1])
    prompt = np.asarray([9, 8, 7], np.int32)
    ref = greedy_generate(pp, pc, prompt, max_length=12, no_repeat_ngram_size=0)
    kv = greedy_generate_kv(pp, pc, prompt, max_length=12,
                            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(ref, kv)


def test_opt_packed_serving_matches_unpacked(opt):
    """Fused qkv/— packing on OPT (biased projections stay separate adds)."""
    from ssp_x_vit_tpu.llm.serve import pack_llm_params_for_serving

    params, cfg = opt
    prompt = np.asarray([4, 8, 15, 16], np.int32)
    ref = generate_kv_scan(params, cfg, prompt, max_length=14,
                           cache_dtype=jnp.float32)
    packed = pack_llm_params_for_serving(params, cfg)
    assert "qkv_kernel" in packed["blocks"]
    out = generate_kv_scan(packed, cfg, prompt, max_length=14,
                           cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_top_p_nucleus_restriction():
    """Nucleus sampling: tokens outside the smallest prefix of sorted
    probability mass reaching top_p (crossing token INCLUDED — the HF
    convention) are never sampled; tiny top_p degenerates to argmax."""
    from ssp_x_vit_tpu.llm.serve import _sample_token

    # distribution: probs ~ [0.5, 0.25, 0.125, ...] over 8 tokens
    logits = jnp.log(jnp.asarray([[0.5 ** (i + 1) for i in range(8)]],
                                 jnp.float32))
    draws = []
    for i in range(200):
        t = _sample_token(logits, jax.random.PRNGKey(i), 1.0, None, 0.7)
        draws.append(int(t[0]))
    # mass before: t0=0 < .7 keep; t1=.5 < .7 keep; t2=.75 >= .7 drop
    assert set(draws) <= {0, 1}
    assert set(draws) == {0, 1}  # both nucleus members actually drawn
    for i in range(20):
        t = _sample_token(logits, jax.random.PRNGKey(i), 1.0, None, 1e-6)
        assert int(t[0]) == 0  # top-1 always survives


def test_top_p_generation_runs(llm):
    params, cfg = llm
    prompt = np.asarray([5, 6], np.int32)
    rng = jax.random.PRNGKey(42)
    a = generate_kv_scan(params, cfg, prompt, max_length=12, temperature=0.8,
                         top_p=0.9, rng=rng, cache_dtype=jnp.float32)
    b = generate_kv_scan(params, cfg, prompt, max_length=12, temperature=0.8,
                         top_p=0.9, rng=rng, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(a, b)
    assert len(a) == 12 and a.min() >= 0 and a.max() < cfg.vocab_size


def test_top_p_zero_rejected():
    from ssp_x_vit_tpu.llm.serve import _sample_token
    logits = jnp.zeros((1, 8), jnp.float32)
    with pytest.raises(ValueError, match="top_p"):
        _sample_token(logits, jax.random.PRNGKey(0), 1.0, None, 0.0)


def test_beam_kv_matches_recompute_beam():
    """KV-cached beam search == the full-recompute beam search at f32 (same
    selection math; cached logits equal recompute logits), with and without
    an eos + early stopping, across enough steps for beams to diverge and
    cache rows to reorder."""
    from ssp_x_vit_tpu.llm.generate import beam_generate, beam_generate_kv
    from ssp_x_vit_tpu.llm.model import init_llama_params

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4, 1, 5, 9], np.int32)
    for eos in (None, 7):
        ref = beam_generate(params, cfg, prompt, max_length=24, num_beams=3,
                            eos_token_id=eos, compute_dtype=jnp.float32)
        kv = beam_generate_kv(params, cfg, prompt, max_length=24, num_beams=3,
                              eos_token_id=eos, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_beam_kv_early_stopping_false_terminates():
    """With early_stopping=False a finished shorter beam can hold the top
    slot while live beams keep extending; both beam variants must stop at
    max_length instead of writing past the cache/token buffers."""
    from ssp_x_vit_tpu.llm.generate import beam_generate, beam_generate_kv
    from ssp_x_vit_tpu.llm.model import init_llama_params

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4, 1, 5, 9], np.int32)
    # eos that actually appears early for some beam on random weights is not
    # guaranteed; sweep a few ids so at least one run exercises the
    # finished-top-beam-with-live-tails state, and ALL must terminate.
    for eos in (5, 7, 11):
        ref = beam_generate(params, cfg, prompt, max_length=20, num_beams=3,
                            eos_token_id=eos, early_stopping=False,
                            compute_dtype=jnp.float32)
        kv = beam_generate_kv(params, cfg, prompt, max_length=20, num_beams=3,
                              eos_token_id=eos, early_stopping=False)
        assert len(ref) <= 20 and len(kv) <= 20
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


# ---------------- in-graph eos early exit (decode_while) ----------------

def test_early_stop_matches_scan_path(llm):
    """decode_while (eos early exit) produces IDENTICAL trimmed outputs to
    the full decode_scan path: pick a token the model actually generates as
    eos so the exit genuinely fires mid-budget."""
    params, cfg = llm
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    free = generate_kv_scan(params, cfg, prompt, max_length=24,
                            cache_dtype=jnp.float32)
    eos = int(np.asarray(free)[len(prompt) + 3])  # 4th generated token

    full = generate_kv_scan(params, cfg, prompt, max_length=24,
                            eos_token_id=eos, cache_dtype=jnp.float32,
                            early_stop=False)
    early = generate_kv_scan(params, cfg, prompt, max_length=24,
                             eos_token_id=eos, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(early))
    assert eos in np.asarray(early).tolist()  # the exit genuinely fired


def test_early_stop_batched_staggered(llm):
    """Rows hitting eos at different steps: each row's trimmed output equals
    the non-early path (finished rows keep feeding eos; later rows keep
    decoding)."""
    params, cfg = llm
    prompts = [np.asarray([5, 6, 7], np.int32),
               np.asarray([11, 12, 13, 14], np.int32)]
    free = generate_kv_scan(params, cfg, prompts, max_length=20,
                            cache_dtype=jnp.float32)
    # an eos that appears in row 0's generation (row 1 may never hit it)
    eos = int(np.asarray(free[0])[len(prompts[0]) + 2])

    full = generate_kv_scan(params, cfg, prompts, max_length=20,
                            eos_token_id=eos, cache_dtype=jnp.float32,
                            early_stop=False)
    early = generate_kv_scan(params, cfg, prompts, max_length=20,
                             eos_token_id=eos, cache_dtype=jnp.float32)
    for f, e in zip(full, early):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(e))


def test_early_stop_with_penalties(llm):
    """The penalty state rides the while_loop carry exactly like the scan."""
    from ssp_x_vit_tpu.llm.sampling import SamplingParams

    params, cfg = llm
    prompt = np.asarray([9, 2, 9], np.int32)
    sp = SamplingParams(repetition_penalty=1.3, frequency_penalty=0.2)
    free = generate_kv_scan(params, cfg, prompt, max_length=20,
                            cache_dtype=jnp.float32, sampling=sp)
    eos = int(np.asarray(free)[len(prompt) + 4])
    full = generate_kv_scan(params, cfg, prompt, max_length=20,
                            eos_token_id=eos, cache_dtype=jnp.float32,
                            sampling=sp, early_stop=False)
    early = generate_kv_scan(params, cfg, prompt, max_length=20,
                             eos_token_id=eos, cache_dtype=jnp.float32,
                             sampling=sp)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(early))
