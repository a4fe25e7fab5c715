"""Serving sampler: min-p + repetition/presence/frequency penalties
(llm/sampling.py) — HF LogitsProcessor numerics, vLLM state semantics,
carried through the one-dispatch decode scan.

The reference decodes greedy/beam only (src/evaluation.py:152-171); the
serving knob set here is validated against transformers' processors where
they exist and against a slow full-recompute reference loop end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward
from ssp_x_vit_tpu.llm.sampling import (SamplingParams, apply_penalties,
                                        filter_logits, init_penalty_state,
                                        sample, update_counts)

CFG = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, intermediate_size=48)


def test_repetition_penalty_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor)

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 64)).astype(np.float32)
    history = np.array([[3, 5, 3, 9], [1, 1, 2, 60]], np.int64)

    proc = RepetitionPenaltyLogitsProcessor(penalty=1.7)
    want = proc(torch.from_numpy(history),
                torch.from_numpy(logits.copy())).numpy()

    # history as prompt presence (counts empty) — same set of "seen" tokens
    pmask, counts = init_penalty_state(
        jnp.asarray(history.astype(np.int32)),
        jnp.ones_like(history, dtype=bool), 64)
    got = apply_penalties(jnp.asarray(logits), pmask, counts,
                          SamplingParams(repetition_penalty=1.7))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_min_p_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.generation.logits_process import MinPLogitsWarper

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 64)).astype(np.float32) * 3
    warper = MinPLogitsWarper(min_p=0.2)
    want = warper(None, torch.from_numpy(logits.copy())).numpy()

    got = filter_logits(jnp.asarray(logits), SamplingParams(
        temperature=1.0, min_p=0.2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_presence_frequency_semantics():
    """OpenAI semantics: logits - presence*1[count>0] - frequency*count,
    GENERATED tokens only (prompt mask untouched)."""
    logits = jnp.zeros((1, 8))
    pmask = jnp.zeros((1, 8)).at[0, 1].set(1.0)     # token 1 in prompt only
    counts = jnp.zeros((1, 8)).at[0, 2].set(3.0)    # token 2 generated 3x
    sp = SamplingParams(presence_penalty=0.5, frequency_penalty=0.25)
    out = np.asarray(apply_penalties(logits, pmask, counts, sp))[0]
    assert out[1] == 0.0                            # prompt-only: untouched
    assert abs(out[2] - (-0.5 - 0.75)) < 1e-6       # presence + 3*frequency
    assert out[0] == 0.0


def test_validation():
    with pytest.raises(ValueError, match="top_p"):
        SamplingParams(temperature=1.0, top_p=0.0)
    with pytest.raises(ValueError, match="repetition_penalty"):
        SamplingParams(repetition_penalty=0.0)
    with pytest.raises(ValueError, match="min_p"):
        SamplingParams(temperature=1.0, min_p=1.5)
    assert not SamplingParams().needs_counts
    assert SamplingParams(frequency_penalty=0.1).needs_counts
    hash(SamplingParams(top_k=5))  # static jit arg


def test_neutral_sampling_params_equal_plain_greedy():
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    plain = generate_kv_scan(params, CFG, prompt, max_length=18,
                             cache_dtype=jnp.float32)
    neutral = generate_kv_scan(params, CFG, prompt, max_length=18,
                               cache_dtype=jnp.float32,
                               sampling=SamplingParams())
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(neutral))


def test_presence_penalty_blocks_repeats_in_scan():
    """A huge presence penalty makes greedy decode never re-emit a generated
    token — proves the counts buffer rides the scan carry correctly."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    prompt = np.asarray([7, 7, 7], np.int32)
    out = generate_kv_scan(params, CFG, prompt, max_length=24,
                           cache_dtype=jnp.float32,
                           sampling=SamplingParams(presence_penalty=1e9))
    gen = np.asarray(out)[len(prompt):]
    assert len(set(gen.tolist())) == len(gen), gen


def _reference_penalized_greedy(params, cfg, prompt, max_length, sp):
    """Slow gold loop: full recompute each step + host-side penalties."""
    seq = list(map(int, prompt))
    counts = np.zeros(cfg.vocab_size, np.float32)
    pmask = np.zeros(cfg.vocab_size, np.float32)
    pmask[list(map(int, prompt))] = 1.0
    while len(seq) < max_length:
        logits, _ = llama_forward(params, jnp.asarray([seq], jnp.int32), cfg,
                                  compute_dtype=jnp.float32)
        z = np.asarray(logits)[0, -1].astype(np.float64)
        if sp.repetition_penalty != 1.0:
            seen = (pmask > 0) | (counts > 0)
            z = np.where(seen, np.where(z > 0, z / sp.repetition_penalty,
                                        z * sp.repetition_penalty), z)
        z = z - sp.frequency_penalty * counts
        z = z - sp.presence_penalty * (counts > 0)
        nxt = int(np.argmax(z))
        counts[nxt] += 1.0
        seq.append(nxt)
    return np.asarray(seq, np.int32)


def test_scan_penalties_match_reference_loop():
    """End-to-end gold test: the one-dispatch scan with all three penalties
    equals a host-side full-recompute loop implementing the same
    semantics."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    prompt = np.asarray([9, 2, 9], np.int32)
    sp = SamplingParams(repetition_penalty=1.3, presence_penalty=0.4,
                        frequency_penalty=0.2)
    fast = generate_kv_scan(params, CFG, prompt, max_length=16,
                            cache_dtype=jnp.float32, sampling=sp)
    gold = _reference_penalized_greedy(params, CFG, prompt, 16, sp)
    np.testing.assert_array_equal(np.asarray(fast), gold)


def test_batched_penalties_per_row():
    """Left-padded batch: each row's penalty state is independent and pad
    slots are not counted as prompt tokens (pad id 0 must stay unpenalized
    for the shorter row... unless IT generated/contains 0)."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    prompts = [np.asarray([5, 6, 7, 8, 9], np.int32),
               np.asarray([11, 12], np.int32)]
    sp = SamplingParams(repetition_penalty=1.5)
    outs = generate_kv_scan(params, CFG, prompts, max_length=14,
                            cache_dtype=jnp.float32, sampling=sp)
    for p, o in zip(prompts, outs):
        gold = _reference_penalized_greedy(params, CFG, p, 14, sp)
        np.testing.assert_array_equal(np.asarray(o), gold)


def test_min_p_sampling_runs():
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
    out = generate_kv_scan(params, CFG, np.asarray([1, 2, 3], np.int32),
                           max_length=12, cache_dtype=jnp.float32,
                           rng=jax.random.PRNGKey(7),
                           sampling=SamplingParams(temperature=0.8,
                                                   min_p=0.1))
    assert len(out) == 12 and out.min() >= 0 and out.max() < CFG.vocab_size
