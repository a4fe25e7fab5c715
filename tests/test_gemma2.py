"""Gemma-2 family + mixed per-layer sliding windows: HF logit parity and
forward semantics (alternating SWA, attn/final softcaps, 4-norm blocks,
query_pre_attn_scalar fold)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward

G2 = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                 num_kv_heads=2, intermediate_size=64, model_type="gemma2",
                 explicit_head_dim=16, hidden_act="gelu_tanh",
                 scale_embeddings=True, tie_embeddings=True,
                 sliding_window=6, window_layers=(0, 2),
                 attn_softcap=50.0, final_softcap=30.0)


def test_gemma2_logits_match_hf(tmp_path):
    """vs transformers Gemma2ForCausalLM: alternating sliding windows
    (binding: window 8 < seq 24), both softcaps, 4 norms, qps=32 != head_dim
    scale fold, head_dim != hidden/heads, eager attention."""
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    hf_cfg = Gemma2Config(vocab_size=96, hidden_size=32, num_hidden_layers=4,
                          num_attention_heads=4, num_key_value_heads=2,
                          intermediate_size=48, head_dim=16,
                          max_position_embeddings=64, sliding_window=8,
                          query_pre_attn_scalar=32,
                          attn_logit_softcapping=50.0,
                          final_logit_softcapping=30.0,
                          hidden_activation="gelu_pytorch_tanh",
                          attn_implementation="eager")
    torch.manual_seed(0)
    with torch.no_grad():
        hf_model = Gemma2ForCausalLM(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path / "g2")

        from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama

        params, cfg = load_hf_llama(str(tmp_path / "g2"), dtype=jnp.float32)
        assert cfg.model_type == "gemma2" and cfg.head_dim == 16
        assert cfg.sliding_window == 8 and cfg.window_layers == (0, 2)
        assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0

        tokens = np.arange(24, dtype=np.int32)[None] % 96
        hf_logits = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3,
                               atol=2e-3)


def test_qwen2_mixed_window_logits_match_hf(tmp_path):
    """qwen2 with max_window_layers=2 of 4: the first two layers run FULL
    attention, the last two the window — per-layer traced bounds vs HF."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(vocab_size=96, hidden_size=32, num_hidden_layers=4,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=48, max_position_embeddings=64,
                         sliding_window=8, use_sliding_window=True,
                         max_window_layers=2, tie_word_embeddings=False,
                         attn_implementation="eager")
    torch.manual_seed(0)
    with torch.no_grad():
        hf_model = Qwen2ForCausalLM(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path / "q2")

        from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama

        params, cfg = load_hf_llama(str(tmp_path / "q2"), dtype=jnp.float32)
        assert cfg.sliding_window == 8 and cfg.window_layers == (2, 3)

        tokens = np.arange(24, dtype=np.int32)[None] % 96
        hf_logits = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=5e-4,
                               atol=5e-4)


def test_mixed_window_locality():
    """With windows only on layers (0, 2) of 4, information still flows from
    distant tokens through the FULL layers — but an all-windowed config
    forgets them: distinguishes per-layer bounds from a global window."""
    base = dict(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=64, sliding_window=4)
    mixed = LlamaConfig(**base, window_layers=(0,))
    allw = LlamaConfig(**base)
    params = init_llama_params(jax.random.PRNGKey(1), mixed, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    t1 = rng.integers(0, 96, size=(1, 16)).astype(np.int32)
    t2 = t1.copy()
    t2[0, :4] = rng.integers(0, 96, size=4)  # distant edit

    for cfg, differs in ((mixed, True), (allw, False)):
        a, _ = llama_forward(params, jnp.asarray(t1), cfg,
                             compute_dtype=jnp.float32)
        b, _ = llama_forward(params, jnp.asarray(t2), cfg,
                             compute_dtype=jnp.float32)
        delta = float(jnp.max(jnp.abs(a[0, -1] - b[0, -1])))
        assert (delta > 1e-5) == differs, (cfg.window_layers, delta)


@pytest.fixture(scope="module")
def g2_model():
    return (init_llama_params(jax.random.PRNGKey(0), G2, dtype=jnp.float32), G2)


def test_gemma2_kv_serving_matches_recompute(g2_model):
    """Contiguous KV serving with per-layer traced bounds + both softcaps ==
    full recompute, past the window (slots wrap the band several times)."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params, cfg = g2_model
    prompt = np.asarray([3, 1, 4, 1, 5, 9, 2, 6], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=24,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, cfg, prompt, max_length=24,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_gemma2_paged_serving_matches_recompute(g2_model):
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.paged import PagedServer

    params, cfg = g2_model
    prompt = np.asarray([7, 2, 9, 4, 1], np.int32)
    srv = PagedServer(params, cfg, max_batch=1, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.float32,
                      chunked_prefill=4, prefix_cache=True)
    rid = srv.add_request(prompt, max_new_tokens=12)
    out = srv.run()[rid]
    ref = greedy_generate(params, cfg, prompt, max_length=len(prompt) + 12,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_qwen2_mixed_kv_serving_matches_recompute():
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4,
                      num_heads=4, num_kv_heads=2, intermediate_size=64,
                      model_type="qwen2", qkv_bias=True, sliding_window=6,
                      window_layers=(2, 3))
    params = init_llama_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    prompt = np.asarray([5, 3, 8, 1], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=22,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, cfg, prompt, max_length=22,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_mixed_window_rolling_refused(g2_model):
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan, init_rolling_cache

    params, cfg = g2_model
    with pytest.raises(ValueError, match="uniform"):
        generate_kv_scan(params, cfg, np.asarray([1, 2, 3], np.int32),
                         max_length=10, rolling=True)
    with pytest.raises(ValueError, match="UNIFORM"):
        init_rolling_cache(cfg, 1)


def test_gemma2_depth_materialized_serving(g2_model):
    """Depth-pruned gemma-2 through the unrolled serve path: ln1_post rides
    the attention key split; per-layer STATIC windows keep flash-capable
    dispatch in the materialized forward."""
    from ssp_x_vit_tpu.llm import pruning as P
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.model import llama_forward_materialized
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params, cfg = g2_model
    mp_, mc = P.materialize_llm_depth_pruning(params, cfg, [1])
    prompt = np.asarray([3, 9, 2], np.int32)
    ref = greedy_generate(mp_, mc, prompt, max_length=16,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(mp_, mc, prompt, max_length=16,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_gemma2_depth_materialized_matches_gated(g2_model):
    """Materialized depth pruning == gate-masked dense search form: ln1_post
    must compact with q/k/v/o, or surviving layers past the pruned one read
    the previous layer's post-attention norm."""
    from ssp_x_vit_tpu.llm import pruning as P
    from ssp_x_vit_tpu.llm.model import llama_forward_materialized

    params, cfg = g2_model
    tokens = jnp.asarray([[3, 9, 2, 7, 1, 4]], jnp.int32)
    gate = jnp.asarray([1.0, 0.0, 1.0, 1.0])
    want, _ = llama_forward(params, tokens, cfg, attn_gate=gate,
                            compute_dtype=jnp.float32)
    mp_, mc = P.materialize_llm_depth_pruning(params, cfg, [1])
    got = llama_forward_materialized(mp_, tokens, mc,
                                     compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gemma2_speculative_exact(g2_model):
    """Speculative decoding on a gemma-2 target: the multi-token extend path
    runs the same per-layer bounds + softcaps via _run_layers — composite
    greedy == dense greedy at f32."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    params, cfg = g2_model
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    out, stats = speculative_generate(
        params, cfg, params, cfg, prompt, max_length=18, k=3,
        cache_dtype=jnp.float32)
    ref = greedy_generate(params, cfg, prompt, max_length=18,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
