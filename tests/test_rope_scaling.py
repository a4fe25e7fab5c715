"""RoPE scaling (HF ``rope_scaling``: linear / llama3 / yarn).

The reference never parses rope_scaling (its HF configs predate llama-3;
src/main.py inherits whatever transformers does at load). Here the formulas
live in llm/rope.py and every path — full forward, KV-cached decode, ring
attention, pipeline — derives the SAME frequencies from the config, so the
exactness contracts (cached == recompute) extend to scaled-rope checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.rope import (RopeScaling, export_rope_scaling,
                                    parse_rope_scaling, rope_freqs)

LLAMA3 = RopeScaling(rope_type="llama3", factor=8.0, low_freq_factor=1.0,
                     high_freq_factor=4.0,
                     original_max_position_embeddings=64)
YARN = RopeScaling(rope_type="yarn", factor=4.0, beta_fast=32.0,
                   beta_slow=1.0, original_max_position_embeddings=64)


def _hf_inv_freq(kind, theta, head_dim, scaling_dict, max_pos=131072):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlama
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    hf = HFLlama(hidden_size=head_dim * 4, num_attention_heads=4,
                 rope_theta=theta, rope_scaling=dict(scaling_dict),
                 max_position_embeddings=max_pos)
    inv, scale = ROPE_INIT_FUNCTIONS[kind](hf, device="cpu")
    return inv.numpy(), float(scale)


@pytest.mark.parametrize("kind,theta,d", [
    ("llama3", 500000.0, {"rope_type": "llama3", "factor": 8.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 8192}),
    ("yarn", 10000.0, {"rope_type": "yarn", "factor": 4.0,
                       "beta_fast": 32.0, "beta_slow": 1.0,
                       "original_max_position_embeddings": 4096}),
    ("yarn", 10000.0, {"rope_type": "yarn", "factor": 4.0,
                       "attention_factor": 1.3, "truncate": False,
                       "original_max_position_embeddings": 4096}),
    # deepseek-style: attention factor = mscale-temperature ratio
    ("yarn", 10000.0, {"rope_type": "yarn", "factor": 40.0,
                       "beta_fast": 32.0, "beta_slow": 1.0,
                       "mscale": 1.0, "mscale_all_dim": 1.0,
                       "original_max_position_embeddings": 4096}),
    ("yarn", 10000.0, {"rope_type": "yarn", "factor": 4.0,
                       "mscale": 1.2, "mscale_all_dim": 0.8,
                       "original_max_position_embeddings": 4096}),
    ("linear", 10000.0, {"rope_type": "linear", "factor": 2.0}),
])
def test_inv_freq_matches_transformers(kind, theta, d):
    inv_hf, scale_hf = _hf_inv_freq(kind, theta, 64, d)
    inv, scale = rope_freqs(theta, 64, parse_rope_scaling(d))
    np.testing.assert_allclose(inv, inv_hf, rtol=1e-6, atol=1e-9)
    assert abs(scale - scale_hf) < 1e-9


def test_dynamic_ntk_refused():
    # dynamic frequencies depend on observed sequence length -> cached
    # decode would disagree with recompute; refused at parse time
    with pytest.raises(ValueError, match="dynamic"):
        parse_rope_scaling({"rope_type": "dynamic", "factor": 2.0})


def test_export_parse_round_trip():
    for sc in (LLAMA3, YARN,
               RopeScaling(rope_type="linear", factor=2.0),
               RopeScaling(rope_type="yarn", factor=4.0,
                           attention_factor=1.25, truncate=False),
               RopeScaling(rope_type="yarn", factor=40.0,
                           mscale=1.0, mscale_all_dim=1.0)):
        assert parse_rope_scaling(export_rope_scaling(sc)) == sc
    assert export_rope_scaling(None) is None
    assert parse_rope_scaling(None) is None


def test_llama3_hf_logit_parity(tmp_path):
    """Full-model parity: HF LlamaForCausalLM with llama-3.1-style
    rope_scaling vs our forward on the converted checkpoint. Sequence runs
    PAST original_max_position_embeddings/8 so scaled dims genuinely bind."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=48,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False, rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64})
    torch.manual_seed(0)
    with torch.no_grad():
        hf_model = LlamaForCausalLM(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path / "llama31")
        tokens = np.arange(96, dtype=np.int32)[None] % 96
        hf_logits = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).logits.float().numpy()

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "llama31"), dtype=jnp.float32)
    assert cfg.rope_scaling == RopeScaling(
        rope_type="llama3", factor=8.0, low_freq_factor=1.0,
        high_freq_factor=4.0, original_max_position_embeddings=64)
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)


def test_yarn_hf_logit_parity(tmp_path):
    """YaRN exercises the attention_scaling multiplier on cos/sin (the only
    scaling type where it differs from 1)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=48,
        max_position_embeddings=256, tie_word_embeddings=False,
        rope_theta=10000.0,
        rope_scaling={"rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
                      "beta_slow": 1.0,
                      "original_max_position_embeddings": 64})
    torch.manual_seed(1)
    with torch.no_grad():
        hf_model = LlamaForCausalLM(hf_cfg).eval()
        hf_model.save_pretrained(tmp_path / "yarn")
        tokens = (np.arange(96, dtype=np.int32)[None] * 7) % 96
        hf_logits = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).logits.float().numpy()

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    params, cfg = load_hf_llama(str(tmp_path / "yarn"), dtype=jnp.float32)
    assert cfg.rope_scaling.rope_type == "yarn"
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)


SCALED_CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                         num_heads=4, num_kv_heads=2, intermediate_size=48,
                         rope_scaling=YARN)


def test_kv_serving_exact_with_scaling():
    """Cached decode == full recompute under yarn scaling (the per-position
    serving rope and the full-sequence rope must derive identical scaled
    frequencies AND the same attention_scaling)."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(0), SCALED_CFG,
                               dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4, 1, 5, 9], np.int32)
    ref = greedy_generate(params, SCALED_CFG, prompt, max_length=20,
                          no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, SCALED_CFG, prompt, max_length=20,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(kv))


def test_seq_parallel_matches_single_with_scaling():
    """Ring attention derives the same scaled frequencies at global
    positions."""
    from jax.sharding import Mesh
    from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
    from ssp_x_vit_tpu.parallel.ring_attention import (
        evaluate_perplexity_seq_parallel)

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=48,
                      rope_scaling=LLAMA3)
    params = init_llama_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    stream = synthetic_token_stream(64 * 2, cfg.vocab_size, seed=2)
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=64,
                                     enable_tqdm=False)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ppl_sp = evaluate_perplexity_seq_parallel(params, cfg, mesh, stream,
                                              seq_len=64)
    assert abs(np.log(ppl_sp) - np.log(ppl_single)) < 1e-3


def test_native_persistence_round_trip(tmp_path):
    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model, save_llm_model

    params = init_llama_params(jax.random.PRNGKey(2), SCALED_CFG,
                               dtype=jnp.float32)
    save_llm_model(str(tmp_path / "m"), params, SCALED_CFG)
    p2, c2 = load_llm_model(str(tmp_path / "m"), dtype=jnp.float32)
    assert c2 == SCALED_CFG
    assert isinstance(c2.rope_scaling, RopeScaling)  # hashable static config
    hash(c2)


def test_hf_export_round_trip(tmp_path):
    """export_hf_llama re-emits rope_scaling; reloading through transformers
    AND through our reader preserves the logits."""
    torch = pytest.importorskip("torch")
    from transformers import AutoModelForCausalLM

    from ssp_x_vit_tpu.llm.checkpoints import export_hf_llama, load_hf_llama
    from ssp_x_vit_tpu.llm.model import llama_forward

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=48,
                      rope_scaling=LLAMA3, max_position_embeddings=256)
    params = init_llama_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    out = export_hf_llama(str(tmp_path / "exp"), params, cfg)

    tokens = np.arange(80, dtype=np.int32)[None] % 96
    ours, _ = llama_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)

    with torch.no_grad():
        hf = AutoModelForCausalLM.from_pretrained(out).eval()
        assert hf.config.rope_scaling["factor"] == 8.0
        hf_logits = hf(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=5e-4, atol=5e-4)

    p2, c2 = load_hf_llama(out, dtype=jnp.float32)
    assert c2.rope_scaling == LLAMA3
