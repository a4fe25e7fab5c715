"""Sliding-window attention (mistral): forward locality, serving exactness,
HF parity.

HF convention (transformers modeling_mistral): query position q attends keys
k with k <= q and q - k < sliding_window. Serving keeps absolute-position
RoPE keys in the cache and adds the window band to the decode mask, so
KV-cached greedy decoding equals full recompute exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.generate import greedy_generate
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward
from ssp_x_vit_tpu.llm.serve import greedy_generate_kv, generate_kv_scan

CFG_FULL = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, intermediate_size=64,
                       model_type="mistral")
CFG_SWA = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=64,
                      model_type="mistral", sliding_window=6)


@pytest.fixture(scope="module")
def params():
    return init_llama_params(jax.random.PRNGKey(0), CFG_FULL, dtype=jnp.float32)


def test_swa_forward_locality(params):
    """With window w, position t only sees tokens (t-w, t]: edits to tokens
    at distance >= w (plus one safety layer-hop) cannot change logits at t
    for a 1-layer model; and SWA differs from full causal."""
    cfg1 = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=1,
                       num_heads=4, num_kv_heads=2, intermediate_size=64,
                       sliding_window=6)
    p1 = init_llama_params(jax.random.PRNGKey(1), cfg1, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 96, size=(1, 20)).astype(np.int32)
    toks2 = toks.copy()
    toks2[0, :8] = rng.integers(0, 96, size=8)  # t=19 sees only (13..19]

    out1, _ = llama_forward(p1, jnp.asarray(toks), cfg1, compute_dtype=jnp.float32)
    out2, _ = llama_forward(p1, jnp.asarray(toks2), cfg1, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1[0, -1]), np.asarray(out2[0, -1]),
                               rtol=1e-6, atol=1e-6)

    # And the window genuinely binds vs full causal on the same weights.
    full_cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=1,
                           num_heads=4, num_kv_heads=2, intermediate_size=64)
    out_full, _ = llama_forward(p1, jnp.asarray(toks), full_cfg,
                                compute_dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(out_full[0, -1] - out1[0, -1]))) > 1e-4


def test_swa_window_wider_than_seq_is_full_causal(params):
    toks = jnp.asarray(np.arange(10, dtype=np.int32)[None] % 96)
    wide = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, intermediate_size=64,
                       model_type="mistral", sliding_window=4096)
    a, _ = llama_forward(params, toks, CFG_FULL, compute_dtype=jnp.float32)
    b, _ = llama_forward(params, toks, wide, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swa_kv_generation_matches_recompute(params):
    """Cached decode masks the window over global cache indices — greedy
    through the KV path must equal full-recompute greedy past the window."""
    prompt = np.asarray([3, 1, 4, 1, 5, 9, 2, 6], np.int32)
    # no_repeat_ngram_size=0: a windowed random-weight model settles into a
    # cycle (the window forgets), which would trip the qualitative-eval
    # n-gram ban and mask the comparison.
    ref = greedy_generate(params, CFG_SWA, prompt, max_length=24,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = greedy_generate_kv(params, CFG_SWA, prompt, max_length=24,
                            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_swa_kv_scan_generation_matches_recompute(params):
    prompt = np.asarray([7, 7, 2, 9], np.int32)
    ref = greedy_generate(params, CFG_SWA, prompt, max_length=20,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    out = generate_kv_scan(params, CFG_SWA, prompt, max_length=20,
                           cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_mistral_swa_logits_match_hf(tmp_path):
    """End-to-end vs transformers MistralForCausalLM with a binding window
    (sliding_window=8 < seq 24): config parsing, weight conversion, and the
    band mask all verified against the HF eager implementation."""
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           intermediate_size=48, max_position_embeddings=64,
                           sliding_window=8, tie_word_embeddings=False,
                           attn_implementation="eager")
    torch.manual_seed(0)
    with torch.no_grad():
        hf_model = MistralForCausalLM(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path / "mistral")

        from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama

        params, cfg = load_hf_llama(str(tmp_path / "mistral"), dtype=jnp.float32)
        assert cfg.sliding_window == 8 and cfg.model_type == "mistral"

        tokens = np.arange(24, dtype=np.int32)[None] % 96
        hf_logits = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=5e-4, atol=5e-4)


def test_rolling_cache_matches_recompute(params):
    """W-slot rolling cache (slot = position mod window): greedy through the
    bounded cache == full recompute, with generation running well past the
    window so slots wrap several times. Batch mixes a prompt longer than the
    window (prefill gather keeps only the newest W keys) with a shorter one
    (left-padded; unwritten slots masked via key_global < pad)."""
    prompts = [np.asarray([3, 1, 4, 1, 5, 9, 2, 6, 5, 3], np.int32),  # > W=6
               np.asarray([7, 2, 9], np.int32)]                       # < W
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    outs = generate_kv_scan(params, CFG_SWA, prompts, max_length=30,
                            cache_dtype=jnp.float32, rolling=True)
    for p, got in zip(prompts, outs):
        ref = greedy_generate(params, CFG_SWA, p, max_length=30,
                              no_repeat_ngram_size=0, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rolling_cache_is_window_bounded(params):
    from ssp_x_vit_tpu.llm.serve import init_rolling_cache
    ck, cv = init_rolling_cache(CFG_SWA, batch=2, dtype=jnp.float32)
    assert ck.shape[2] == CFG_SWA.sliding_window  # [A, b, W, nkv, hd]
    with pytest.raises(ValueError):
        init_rolling_cache(CFG_FULL, batch=1)


def test_rolling_cache_int8_matches_contiguous_int8(params):
    """int8 rolling == int8 contiguous exactly: both quantize the same
    per-token k/v with the same quantizer; the rolling layout changes only
    WHERE codes live, not their values."""
    from ssp_x_vit_tpu.llm.serve import greedy_generate_kv
    prompt = np.asarray([3, 1, 4, 1, 5, 9, 2, 6], np.int32)
    a = greedy_generate_kv(params, CFG_SWA, prompt, max_length=26,
                           cache_dtype=jnp.int8)
    b = greedy_generate_kv(params, CFG_SWA, prompt, max_length=26,
                           cache_dtype=jnp.int8, rolling=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rolling_requires_window(params):
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    with pytest.raises(ValueError):
        generate_kv_scan(params, CFG_FULL, np.asarray([1, 2, 3], np.int32),
                         max_length=10, rolling=True)


def test_hf_config_window_semantics():
    """config_from_hf_dict must mirror each arch's HF behavior: mistral and
    phi3 apply sliding_window unconditionally; qwen2 only under
    use_sliding_window AND only when NO layer runs full attention
    (max_window_layers >= num_layers means HF windows nothing; a genuinely
    mixed split is refused rather than mis-masked globally)."""
    from ssp_x_vit_tpu.llm.checkpoints import config_from_hf_dict

    base = dict(vocab_size=96, hidden_size=32, num_hidden_layers=4,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=64)
    assert config_from_hf_dict({**base, "model_type": "mistral",
                                "sliding_window": 8}).sliding_window == 8
    assert config_from_hf_dict({**base, "model_type": "phi3",
                                "sliding_window": 2047}).sliding_window == 2047
    # qwen2: flag off -> ignored
    assert config_from_hf_dict({**base, "model_type": "qwen2",
                                "sliding_window": 8}).sliding_window is None
    # flag on, but max_window_layers defaults to num_layers -> HF windows
    # NO layer -> full attention
    assert config_from_hf_dict({**base, "model_type": "qwen2",
                                "sliding_window": 8,
                                "use_sliding_window": True}).sliding_window is None
    # flag on, every layer windowed (uniform static path)
    u = config_from_hf_dict({**base, "model_type": "qwen2",
                             "sliding_window": 8, "use_sliding_window": True,
                             "max_window_layers": 0})
    assert u.sliding_window == 8 and u.window_layers is None
    # genuinely mixed: the first mwl layers run full attention, the rest
    # the window — per-layer traced bounds (tests/test_gemma2.py HF parity)
    m = config_from_hf_dict({**base, "model_type": "qwen2", "sliding_window": 8,
                             "use_sliding_window": True, "max_window_layers": 2})
    assert m.sliding_window == 8 and m.window_layers == (2, 3)
    assert not m.uniform_window
