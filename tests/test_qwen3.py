"""Qwen3 + Qwen3-MoE model families (QK-norm attention).

Qwen3's delta vs qwen2 is a per-head RMSNorm on q/k between the projections
and rope (HF Qwen3Attention), an explicit head_dim, and no attention bias;
the MoE variant routes softmax->top-k->renormalize (norm_topk_prob=True),
which is exactly the dropless top-k gate of parallel/moe.py. The reference
CLI reaches qwen-2.5 only (src/slicegpt.py:16-31); these are newer archs the
rebuild covers natively.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward

torch = pytest.importorskip("torch")


def _save_hf_qwen3(tmp_path, moe=False, seed=0):
    if moe:
        from transformers import Qwen3MoeConfig as C, Qwen3MoeForCausalLM as M
        extra = dict(num_experts=4, num_experts_per_tok=2,
                     moe_intermediate_size=40, decoder_sparse_step=1,
                     mlp_only_layers=[], norm_topk_prob=True)
    else:
        from transformers import Qwen3Config as C, Qwen3ForCausalLM as M
        extra = {}
    hf_cfg = C(vocab_size=96, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=48, head_dim=16,
               max_position_embeddings=64, tie_word_embeddings=False,
               **extra)
    torch.manual_seed(seed)
    with torch.no_grad():
        model = M(hf_cfg).eval()
        model.save_pretrained(tmp_path)
    return model


def test_qwen3_logits_match_hf(tmp_path):
    hf_model = _save_hf_qwen3(tmp_path / "q3")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama

    params, cfg = load_hf_llama(str(tmp_path / "q3"), dtype=jnp.float32)
    assert cfg.qk_norm and cfg.head_dim == 16 and not cfg.qkv_bias
    assert params["blocks"]["q_norm"].shape == (2, 16)

    tokens = (np.arange(24, dtype=np.int32)[None] * 3) % 96
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)


def test_qwen3_moe_logits_match_hf(tmp_path):
    hf_model = _save_hf_qwen3(tmp_path / "q3moe", moe=True, seed=1)

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama

    params, cfg = load_hf_llama(str(tmp_path / "q3moe"), dtype=jnp.float32)
    assert cfg.num_experts == 4 and cfg.moe_top_k == 2 and cfg.qk_norm
    assert cfg.intermediate_size == 40  # moe_intermediate_size
    assert params["blocks"]["gate_kernel"].shape == (2, 4, 32, 40)

    tokens = (np.arange(24, dtype=np.int32)[None] * 7) % 96
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)


def test_qwen3_kv_serving_matches_recompute(tmp_path):
    _save_hf_qwen3(tmp_path / "q3")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params, cfg = load_hf_llama(str(tmp_path / "q3"), dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=16,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, cfg, prompt, max_length=16,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_qwen3_paged_serving_matches_recompute(tmp_path):
    _save_hf_qwen3(tmp_path / "q3")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.paged import PagedServer

    params, cfg = load_hf_llama(str(tmp_path / "q3"), dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4, 1, 5, 9], np.int32)
    srv = PagedServer(params, cfg, page_size=8, num_pages=32, max_batch=2,
                      max_context=64, cache_dtype=jnp.float32)
    rid = srv.add_request(prompt, max_new_tokens=10)
    out = srv.run()[rid]
    ref = greedy_generate(params, cfg, prompt,
                          max_length=len(prompt) + 10,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qwen3_depth_materialized_serving(tmp_path):
    """Attention removal compacts q_norm/k_norm with the q/k/v/o stacks; the
    unrolled materialized serve stays exact vs full recompute."""
    _save_hf_qwen3(tmp_path / "q3")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.pruning import materialize_llm_depth_pruning
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params, cfg = load_hf_llama(str(tmp_path / "q3"), dtype=jnp.float32)
    p2, c2 = materialize_llm_depth_pruning(params, cfg, [1])
    assert p2["blocks"]["q_norm"].shape[0] == 1
    prompt = np.asarray([5, 6, 7], np.int32)
    ref = greedy_generate(p2, c2, prompt, max_length=14,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(p2, c2, prompt, max_length=14,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_qwen3_2ssp_runs(tmp_path):
    _save_hf_qwen3(tmp_path / "q3")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
    from ssp_x_vit_tpu.llm.pruning import two_stage_2ssp

    params, cfg = load_hf_llama(str(tmp_path / "q3"), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 96, size=(1, 32)).astype(np.int32)
             for _ in range(2)]
    p2, c2, info = two_stage_2ssp(params, cfg, calib, 0.3, seq_len=32)
    assert c2.pruned_intermediate_size < cfg.intermediate_size
    ppl = evaluate_perplexity(p2, c2, calib[0], seq_len=32, enable_tqdm=False)
    assert np.isfinite(ppl)


def test_qwen3_slicegpt_refused(tmp_path):
    from ssp_x_vit_tpu.llm.slicegpt import slicegpt

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=48,
                      qk_norm=True, explicit_head_dim=16)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="qwen3"):
        slicegpt(params, cfg, 0.25, [np.zeros((1, 8), np.int32)])


def test_qwen3_export_round_trip(tmp_path):
    _save_hf_qwen3(tmp_path / "q3")

    from transformers import AutoModelForCausalLM
    from ssp_x_vit_tpu.llm.checkpoints import export_hf_llama, load_hf_llama

    params, cfg = load_hf_llama(str(tmp_path / "q3"), dtype=jnp.float32)
    out = export_hf_llama(str(tmp_path / "exp"), params, cfg)

    tokens = np.arange(20, dtype=np.int32)[None] % 96
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    with torch.no_grad():
        hf = AutoModelForCausalLM.from_pretrained(out).eval()
        hf_logits = hf(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)
    p2, c2 = load_hf_llama(out, dtype=jnp.float32)
    assert c2 == cfg


def test_qwen3_moe_export_round_trip(tmp_path):
    _save_hf_qwen3(tmp_path / "q3moe", moe=True, seed=2)

    from transformers import AutoModelForCausalLM
    from ssp_x_vit_tpu.llm.checkpoints import export_hf_llama, load_hf_llama

    params, cfg = load_hf_llama(str(tmp_path / "q3moe"), dtype=jnp.float32)
    out = export_hf_llama(str(tmp_path / "expmoe"), params, cfg)
    tokens = np.arange(16, dtype=np.int32)[None] % 96
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    with torch.no_grad():
        hf = AutoModelForCausalLM.from_pretrained(out).eval()
        assert hf.config.num_experts == 4
        hf_logits = hf(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)
    p2, c2 = load_hf_llama(out, dtype=jnp.float32)
    assert c2 == cfg


def test_qwen3_moe_mixed_dense_refused():
    from ssp_x_vit_tpu.llm.checkpoints import config_from_hf_dict

    base = {"model_type": "qwen3_moe", "vocab_size": 96, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 48, "moe_intermediate_size": 40,
            "num_experts": 4, "num_experts_per_tok": 2}
    with pytest.raises(ValueError, match="norm_topk_prob"):
        config_from_hf_dict(dict(base, norm_topk_prob=False))
    with pytest.raises(ValueError, match="decoder_sparse_step"):
        config_from_hf_dict(dict(base, decoder_sparse_step=2))
    with pytest.raises(ValueError, match="decoder_sparse_step"):
        config_from_hf_dict(dict(base, mlp_only_layers=[0]))


def test_qwen3_tp_serving_matches_single():
    """qk_norm under megatron TP: heads shard, the per-head-dim [hd] norm
    scales replicate (llama_param_specs rule) — tp greedy == single-device."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.parallel.llm_sharding import tp_generate_kv_scan
    from ssp_x_vit_tpu.parallel.mesh import make_mesh

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=48,
                      qk_norm=True, explicit_head_dim=16)
    params = init_llama_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    # non-unit norm scales so a mis-sharded/mis-applied norm cannot hide
    params["blocks"]["q_norm"] = params["blocks"]["q_norm"] * 1.5
    params["blocks"]["k_norm"] = params["blocks"]["k_norm"] * 0.75
    prompt = np.asarray([3, 5, 7, 11], np.int32)
    single = generate_kv_scan(params, cfg, prompt, max_length=14,
                              cache_dtype=jnp.float32)
    mesh = make_mesh(model=2)
    tp = tp_generate_kv_scan(params, cfg, mesh, prompt, max_length=14,
                             cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(tp))
