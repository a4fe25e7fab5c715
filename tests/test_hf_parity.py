"""Numerical parity vs HuggingFace torch models (the BASELINE 'bitwise-close'
requirement): random-init HF models are saved to disk and loaded through our
checkpoint readers; logits must match torch fp32 outputs.

This validates the entire stack end-to-end per architecture: checkpoint
parsing, weight-layout conversion (fused qkv, conv->matmul patchify), and
every forward-pass op (layernorm/rmsnorm eps, exact GELU, RoPE conventions,
attention scaling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _no_grad():
    with torch.no_grad():
        yield


def test_vit_logits_match_hf(tmp_path):
    from transformers import ViTConfig as HFViTConfig, ViTForImageClassification

    hf_cfg = HFViTConfig(hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
                         intermediate_size=128, image_size=32, patch_size=16,
                         num_labels=7)
    torch.manual_seed(0)
    hf_model = ViTForImageClassification(hf_cfg).eval()
    hf_model.save_pretrained(tmp_path / "vit")

    from ssp_x_vit_tpu.models.checkpoints import load_hf_vit
    from ssp_x_vit_tpu.models.vit import vit_forward

    params, cfg = load_hf_vit(str(tmp_path / "vit"))
    assert cfg.num_classes == 7 and cfg.num_layers == 3

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    hf_logits = hf_model(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))).logits.numpy()
    ours, _ = vit_forward(params, jnp.asarray(px), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


def test_llama_logits_match_hf(tmp_path):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           intermediate_size=48, max_position_embeddings=64,
                           rms_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(tmp_path / "llama")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "llama"), dtype=jnp.float32)
    assert cfg.num_kv_heads == 2

    tokens = np.arange(24, dtype=np.int32)[None] % 96
    hf_logits = hf_model(input_ids=torch.from_numpy(tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=5e-4, atol=5e-4)


def test_qwen2_logits_match_hf(tmp_path):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=48, max_position_embeddings=64,
                         tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = Qwen2ForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(tmp_path / "qwen2")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "qwen2"), dtype=jnp.float32)
    assert cfg.qkv_bias

    tokens = np.arange(24, dtype=np.int32)[None] % 96
    hf_logits = hf_model(input_ids=torch.from_numpy(tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=5e-4, atol=5e-4)


def test_phi_logits_match_hf(tmp_path):
    from transformers import PhiConfig, PhiForCausalLM

    hf_cfg = PhiConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=4,
                       intermediate_size=48, max_position_embeddings=64,
                       partial_rotary_factor=0.5)
    torch.manual_seed(0)
    hf_model = PhiForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(tmp_path / "phi")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "phi"), dtype=jnp.float32)
    assert cfg.is_phi and cfg.rotary_dim == 4

    tokens = np.arange(24, dtype=np.int32)[None] % 96
    hf_logits = hf_model(input_ids=torch.from_numpy(tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=5e-4, atol=5e-4)


def test_phi3_logits_match_hf(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM

    hf_cfg = Phi3Config(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=48, max_position_embeddings=64,
                        tie_word_embeddings=False,
                        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    hf_model = Phi3ForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(tmp_path / "phi3")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "phi3"), dtype=jnp.float32)

    tokens = np.arange(24, dtype=np.int32)[None] % 96
    hf_logits = hf_model(input_ids=torch.from_numpy(tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=5e-4, atol=5e-4)


def test_opt_logits_match_hf(tmp_path):
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, ffn_dim=64,
                       max_position_embeddings=64, do_layer_norm_before=True,
                       word_embed_proj_dim=32, tie_word_embeddings=True)
    torch.manual_seed(0)
    hf_model = OPTForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(tmp_path / "opt")

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "opt"), dtype=jnp.float32)
    assert cfg.is_opt and cfg.intermediate_size == 64

    tokens = np.arange(24, dtype=np.int32)[None] % 96
    hf_logits = hf_model(input_ids=torch.from_numpy(tokens.astype(np.int64))).logits.float().numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=5e-4, atol=5e-4)
