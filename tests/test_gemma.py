"""Gemma model family: HF GemmaForCausalLM logit parity (plus-one RMS baked
at load, sqrt(d)-scaled embeddings, tanh-gelu GLU, explicit head_dim, tied
head) and serving exactness through the llama-layout paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward

GEMMA_CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                        num_heads=4, num_kv_heads=2, intermediate_size=64,
                        model_type="gemma", explicit_head_dim=16,
                        hidden_act="gelu_tanh", scale_embeddings=True,
                        tie_embeddings=True)


def test_gemma_logits_match_hf(tmp_path):
    """End-to-end vs transformers GemmaForCausalLM with head_dim (16) !=
    hidden/heads (8): config parsing, weight conversion (+1 norms), embed
    scaling, and the GLU activation all verified against HF eager."""
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    hf_cfg = GemmaConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=48, head_dim=16,
                         max_position_embeddings=64,
                         hidden_activation="gelu_pytorch_tanh",
                         attn_implementation="eager")
    torch.manual_seed(0)
    with torch.no_grad():
        hf_model = GemmaForCausalLM(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path / "gemma")

        from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama

        params, cfg = load_hf_llama(str(tmp_path / "gemma"), dtype=jnp.float32)
        assert cfg.model_type == "gemma" and cfg.head_dim == 16
        assert cfg.hidden_act == "gelu_tanh" and cfg.scale_embeddings
        assert cfg.tie_embeddings

        tokens = np.arange(24, dtype=np.int32)[None] % 96
        hf_logits = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3,
                               atol=2e-3)


@pytest.fixture(scope="module")
def model():
    return (init_llama_params(jax.random.PRNGKey(0), GEMMA_CFG,
                              dtype=jnp.float32), GEMMA_CFG)


def test_gemma_kv_serving_matches_recompute(model):
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params, cfg = model
    prompt = np.asarray([3, 1, 4, 1, 5, 9], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=20,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, cfg, prompt, max_length=20,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_gemma_paged_serving_matches_recompute(model):
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.paged import PagedServer

    params, cfg = model
    prompt = np.asarray([7, 2, 9, 4], np.int32)
    srv = PagedServer(params, cfg, max_batch=1, num_pages=32, page_size=4,
                      max_context=64, cache_dtype=jnp.float32,
                      chunked_prefill=4, prefix_cache=True)
    rid = srv.add_request(prompt, max_new_tokens=10)
    out = srv.run()[rid]
    ref = greedy_generate(params, cfg, prompt, max_length=len(prompt) + 10,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_gemma_quantized_serving_runs(model):
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params, cfg = model
    q = quantize_llm_params_int8(params, cfg)
    out = generate_kv_scan(q, cfg, np.asarray([5, 6, 7], np.int32),
                           max_length=12, cache_dtype=jnp.float32)
    assert len(out) == 12 and out.min() >= 0 and out.max() < cfg.vocab_size


def test_gemma_seq_parallel_matches_single(model):
    """Plain gemma (scaled embeddings, gelu_tanh GLU, tied head) rides
    ring-attention sequence parallelism exactly; the old construction-time
    refusal was lifted when the ring gained the gemma block."""
    from jax.sharding import Mesh
    from ssp_x_vit_tpu.parallel.ring_attention import (
        evaluate_perplexity_seq_parallel)
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
    from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream

    params, cfg = model
    stream = synthetic_token_stream(64 * 2, cfg.vocab_size, seed=11)
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=64,
                                     enable_tqdm=False)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ppl_sp = evaluate_perplexity_seq_parallel(params, cfg, mesh, stream,
                                              seq_len=64)
    assert abs(np.log(ppl_sp) - np.log(ppl_single)) < 1e-3


def test_gemma_2ssp_pruning_runs(model):
    """Gemma prunes through the same 2SSP machinery (importance stats ride
    the gelu_tanh GLU; width gather + depth removal materialize)."""
    from ssp_x_vit_tpu.llm.pruning import two_stage_2ssp
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity

    params, cfg = model
    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 96, size=(1, 32)).astype(np.int32)
             for _ in range(2)]
    p2, c2, info = two_stage_2ssp(params, cfg, calib, 0.3, seq_len=32)
    assert c2.pruned_intermediate_size < cfg.intermediate_size
    ppl = evaluate_perplexity(p2, c2, calib[0], seq_len=32,
                              enable_tqdm=False)
    assert np.isfinite(ppl)


def test_gemma_slicegpt_refused(model):
    from ssp_x_vit_tpu.llm.slicegpt import slicegpt

    params, cfg = model
    with pytest.raises(ValueError, match="gemma"):
        slicegpt(params, cfg, 0.25, [np.zeros((1, 16), np.int32)])


def test_gemma_speculative_exact(model):
    """Speculative decoding on a gemma target: the multi-token extend path
    must scale embeddings like prefill/decode (regression: _extend_body used
    the raw lookup) — composite greedy == dense greedy at f32."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    params, cfg = model
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    out, stats = speculative_generate(
        params, cfg, params, cfg, prompt, max_length=18, k=3,
        cache_dtype=jnp.float32)
    ref = greedy_generate(params, cfg, prompt, max_length=18,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
