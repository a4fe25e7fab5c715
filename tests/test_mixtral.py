"""HF Mixtral checkpoints through the MoE-llama family.

The native MoE family (LlamaConfig.num_experts / moe_top_k, parallel/moe.py)
predates this loader; here real HF ``MixtralForCausalLM`` checkpoints map
onto it: block_sparse_moe.gate -> router [d, E], experts.{e}.w1/w3/w2 ->
expert-stacked gate/up/down kernels. HF routing (softmax over all experts ->
top-k -> renormalize) is exactly the dropless top-k gate, so logits match
and every serving path stays exact. The reference CLI never reaches MoE
architectures at all (src/slicegpt.py:16-31 lists its four dense archs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _tiny_hf_mixtral(tmp_path, window=None):
    from transformers import MixtralConfig, MixtralForCausalLM

    hf_cfg = MixtralConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           intermediate_size=48, num_local_experts=4,
                           num_experts_per_tok=2, max_position_embeddings=64,
                           tie_word_embeddings=False, sliding_window=window)
    torch.manual_seed(0)
    with torch.no_grad():
        hf_model = MixtralForCausalLM(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path / "mixtral")
    return hf_model


def test_mixtral_logits_match_hf(tmp_path):
    hf_model = _tiny_hf_mixtral(tmp_path)

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "mixtral"), dtype=jnp.float32)
    assert cfg.num_experts == 4 and cfg.moe_top_k == 2
    assert cfg.model_type == "mixtral"
    assert params["blocks"]["gate_kernel"].shape == (2, 4, 32, 48)

    tokens = (np.arange(24, dtype=np.int32)[None] * 5) % 96
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)


def test_mixtral_kv_serving_matches_recompute(tmp_path):
    _tiny_hf_mixtral(tmp_path)

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params, cfg = load_hf_llama(str(tmp_path / "mixtral"), dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4, 1, 5], np.int32)
    ref = greedy_generate(params, cfg, prompt, max_length=16,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, cfg, prompt, max_length=16,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_mixtral_export_round_trip(tmp_path):
    """export_hf_llama inverts the loader; transformers reloads the export
    with identical logits (the MoE export path, previously refused)."""
    _tiny_hf_mixtral(tmp_path)

    from transformers import AutoModelForCausalLM
    from ssp_x_vit_tpu.llm.checkpoints import export_hf_llama, load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "mixtral"), dtype=jnp.float32)
    out = export_hf_llama(str(tmp_path / "exp"), params, cfg)

    tokens = np.arange(20, dtype=np.int32)[None] % 96
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    with torch.no_grad():
        hf = AutoModelForCausalLM.from_pretrained(out).eval()
        assert hf.config.num_local_experts == 4
        hf_logits = hf(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)

    p2, c2 = load_hf_llama(out, dtype=jnp.float32)
    assert c2 == cfg


def test_mixtral_top1_refused():
    from ssp_x_vit_tpu.llm.checkpoints import config_from_hf_dict

    with pytest.raises(ValueError, match="num_experts_per_tok=1"):
        config_from_hf_dict({
            "model_type": "mixtral", "vocab_size": 96, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 48, "num_local_experts": 4,
            "num_experts_per_tok": 1})


def test_native_moe_export_still_refused():
    """A native MoE-llama config (model_type 'llama' + num_experts) has no
    HF encoding — the refusal stays, now scoped to non-mixtral types."""
    from ssp_x_vit_tpu.llm.checkpoints import export_hf_llama
    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=48,
                      num_experts=2, moe_top_k=2)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="HF MoE layout"):
        export_hf_llama("/tmp/should_not_exist_moe_export", params, cfg)
