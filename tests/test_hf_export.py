"""HF checkpoint EXPORT (export_hf_llama): the reference ships pruned models
back out with save_pretrained (src/pruning.py:286-290); our exporter writes
config.json + model.safetensors that (a) our own loader round-trips with
identical logits and (b) transformers from_pretrained loads with logit
parity. Self round-trips run torch-free; cross-checks importorskip torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.checkpoints import export_hf_llama, load_hf_llama
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward


def _roundtrip(cfg, tmp_path, seed=0):
    params = init_llama_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(seed + 1), (2, 12), 0,
                                cfg.vocab_size)
    want, _ = llama_forward(params, tokens, cfg, compute_dtype=jnp.float32)
    out = tmp_path / "export"
    export_hf_llama(str(out), params, cfg)
    params2, cfg2 = load_hf_llama(str(out), dtype=jnp.float32)
    got, _ = llama_forward(params2, tokens, cfg2, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    return params, cfg2


def test_export_roundtrip_llama_gqa(tmp_path):
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48)
    _, cfg2 = _roundtrip(cfg, tmp_path)
    assert cfg2.num_kv_heads == 2 and cfg2.model_type == "llama"


def test_export_roundtrip_qwen2_mixed_window(tmp_path):
    """qkv biases + a genuinely-mixed max_window_layers window suffix."""
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=48, model_type="qwen2",
                      qkv_bias=True, sliding_window=6, window_layers=(2, 3))
    _, cfg2 = _roundtrip(cfg, tmp_path, seed=2)
    assert cfg2.sliding_window == 6 and cfg2.window_layers == (2, 3)


def test_export_roundtrip_gemma(tmp_path):
    """(1+w) RMS bake removed on export, re-baked on load; scaled embeds,
    tied head, explicit head_dim."""
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48, model_type="gemma",
                      explicit_head_dim=16, hidden_act="gelu_tanh",
                      scale_embeddings=True, tie_embeddings=True)
    _, cfg2 = _roundtrip(cfg, tmp_path, seed=3)
    assert cfg2.scale_embeddings and cfg2.tie_embeddings


def test_export_roundtrip_gemma2(tmp_path):
    """4 norms, softcaps, alternating windows — exported under
    query_pre_attn_scalar == head_dim with the already-folded q_proj."""
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, model_type="gemma2",
                      explicit_head_dim=16, hidden_act="gelu_tanh",
                      scale_embeddings=True, tie_embeddings=True,
                      sliding_window=6, window_layers=(0, 2),
                      attn_softcap=50.0, final_softcap=30.0)
    _, cfg2 = _roundtrip(cfg, tmp_path, seed=4)
    assert cfg2.attn_softcap == 50.0 and cfg2.window_layers == (0, 2)


def test_export_roundtrip_phi(tmp_path):
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=4, intermediate_size=48, model_type="phi",
                      qkv_bias=True, rotary_dim=4)
    _, cfg2 = _roundtrip(cfg, tmp_path, seed=5)
    assert cfg2.rotary_dim == 4


def test_export_roundtrip_opt(tmp_path):
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=4, intermediate_size=48, model_type="opt",
                      qkv_bias=True, tie_embeddings=True,
                      max_position_embeddings=64)
    _, cfg2 = _roundtrip(cfg, tmp_path, seed=6)
    assert cfg2.is_opt


def test_export_width_pruned_roundtrip(tmp_path):
    """2SSP stage-1-materialized pytree exports with the PRUNED
    intermediate_size (the reference's save_pretrained flow,
    src/pruning.py:286-290) and round-trips logit-exact."""
    from ssp_x_vit_tpu.llm.pruning import materialize_llm_width_pruning

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48)
    params = init_llama_params(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    keeps = [np.arange(32), np.arange(8, 40)]
    p2, cfg2 = materialize_llm_width_pruning(params, cfg, keeps)
    tokens = jax.random.randint(jax.random.PRNGKey(8), (2, 12), 0, 96)
    want, _ = llama_forward(p2, tokens, cfg2, compute_dtype=jnp.float32)
    out = tmp_path / "pruned"
    export_hf_llama(str(out), p2, cfg2)
    p3, cfg3 = load_hf_llama(str(out), dtype=jnp.float32)
    assert cfg3.intermediate_size == 32
    got, _ = llama_forward(p3, tokens, cfg3, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_export_refusals(tmp_path):
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48)
    params = init_llama_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    qp = quantize_llm_params_int8(params, cfg)
    with pytest.raises(ValueError, match="quantized"):
        export_hf_llama(str(tmp_path / "q"), qp, cfg)
    import dataclasses
    with pytest.raises(ValueError, match="depth-materialized"):
        export_hf_llama(str(tmp_path / "d"), params,
                        dataclasses.replace(cfg, pruned_attention_blocks=(1,)))


def test_export_refusals_leave_no_partial_dir(tmp_path):
    """Config-encoding refusals must fire BEFORE any file writes — a caught
    'skipped' export must not leave a corrupt half-checkpoint behind."""
    import dataclasses

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=48)
    params = init_llama_params(jax.random.PRNGKey(10), cfg, dtype=jnp.float32)
    # phi3-typed config: clean ValueError (was: KeyError after writing
    # model.safetensors + truncated config.json)
    with pytest.raises(ValueError, match="phi3"):
        export_hf_llama(str(tmp_path / "p3"), params,
                        dataclasses.replace(cfg, model_type="phi3"))
    assert not (tmp_path / "p3").exists()
    # gemma-2 windows off the even-layer pattern (post-block-removal remap)
    g2 = dataclasses.replace(
        cfg, model_type="gemma2", explicit_head_dim=8, hidden_act="gelu_tanh",
        scale_embeddings=True, tie_embeddings=True, sliding_window=6,
        window_layers=(1, 3), attn_softcap=50.0, final_softcap=30.0)
    with pytest.raises(ValueError, match="even layers"):
        export_hf_llama(str(tmp_path / "g2"), params, g2)
    assert not (tmp_path / "g2").exists()


def test_export_config_defaults_pinned(tmp_path):
    """Fields transformers would otherwise default wrongly are written
    explicitly: mistral sliding_window null (HF defaults 4096) and
    max_position_embeddings (HF llama defaults 2048)."""
    import dataclasses
    import json

    from ssp_x_vit_tpu.llm.checkpoints import hf_dict_from_config

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48,
                      max_position_embeddings=8192)
    d = hf_dict_from_config(cfg)
    assert d["max_position_embeddings"] == 8192
    m = dataclasses.replace(cfg, model_type="mistral")
    dm = hf_dict_from_config(m)
    assert "sliding_window" in dm and dm["sliding_window"] is None
    # and the full export writes them through
    params = init_llama_params(jax.random.PRNGKey(11), m, dtype=jnp.float32)
    export_hf_llama(str(tmp_path / "m"), params, m)
    with open(tmp_path / "m" / "config.json") as f:
        written = json.load(f)
    assert written["sliding_window"] is None
    assert written["max_position_embeddings"] == 8192


def test_native_roundtrip_restores_tuple_fields(tmp_path):
    """JSON lists -> tuples on load: a round-tripped mixed-window config must
    stay hashable (every serving jit uses static_argnames=('cfg',))."""
    import dataclasses

    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model, save_llm_model

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=48, model_type="qwen2",
                      qkv_bias=True, sliding_window=6, window_layers=(2, 3))
    params = init_llama_params(jax.random.PRNGKey(12), cfg, dtype=jnp.float32)
    save_llm_model(str(tmp_path / "n"), params, cfg)
    p2, c2 = load_llm_model(str(tmp_path / "n"), dtype=jnp.float32)
    assert c2.window_layers == (2, 3)
    assert isinstance(c2.window_layers, tuple)
    hash(c2)  # must not raise
    assert c2 == cfg


def test_export_vit_roundtrip(tmp_path):
    """export_hf_vit -> load_hf_vit round-trips dense ViT logits exactly
    (fused qkv re-split, conv patchify fold)."""
    from ssp_x_vit_tpu.models.checkpoints import export_hf_vit, load_hf_vit
    from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=3,
                    num_heads=4, intermediate_size=128, num_classes=7)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                     jnp.float32)
    want, _ = vit_forward(params, px, cfg)
    export_hf_vit(str(tmp_path / "vit"), params, cfg)
    p2, cfg2 = load_hf_vit(str(tmp_path / "vit"))
    assert cfg2.num_classes == 7
    got, _ = vit_forward(p2, px, cfg2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_export_vit_width_pruned_roundtrip(tmp_path):
    """Stage-1 width-pruned ViT exports at the padded uniform width; the
    zero-padded neurons are inert so HF-format logits match exactly."""
    from ssp_x_vit_tpu.models.checkpoints import export_hf_vit, load_hf_vit
    from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from ssp_x_vit_tpu.pruning.width import materialize_width_pruning

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=3,
                    num_heads=4, intermediate_size=128, num_classes=7)
    params = init_vit_params(jax.random.PRNGKey(2), cfg)
    keeps = [np.sort(np.random.default_rng(i).permutation(128)[:96])
             for i in range(3)]
    p2, cfg2 = materialize_width_pruning(params, cfg, keeps)
    px = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 32, 3)),
                     jnp.float32)
    want, _ = vit_forward(p2, px, cfg2)
    export_hf_vit(str(tmp_path / "vitp"), p2, cfg2)
    p3, cfg3 = load_hf_vit(str(tmp_path / "vitp"))
    assert cfg3.intermediate_size == cfg2.padded_intermediate_size
    got, _ = vit_forward(p3, px, cfg3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_export_vit_loads_in_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import ViTForImageClassification

    from ssp_x_vit_tpu.models.checkpoints import export_hf_vit
    from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=3,
                    num_heads=4, intermediate_size=128, num_classes=7)
    params = init_vit_params(jax.random.PRNGKey(4), cfg)
    export_hf_vit(str(tmp_path / "vit"), params, cfg)
    px = np.random.default_rng(5).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hf = ViTForImageClassification.from_pretrained(
            str(tmp_path / "vit"), torch_dtype=torch.float32).eval()
        hf_logits = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).logits.numpy()
    ours, _ = vit_forward(params, jnp.asarray(px), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


def test_export_loads_in_transformers_llama(tmp_path):
    """transformers AutoModelForCausalLM loads our export; torch fp32 logits
    match ours."""
    torch = pytest.importorskip("torch")
    from transformers import AutoModelForCausalLM

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48)
    params = init_llama_params(jax.random.PRNGKey(10), cfg, dtype=jnp.float32)
    out = tmp_path / "llama"
    export_hf_llama(str(out), params, cfg)
    with torch.no_grad():
        hf = AutoModelForCausalLM.from_pretrained(
            str(out), torch_dtype=torch.float32, attn_implementation="eager").eval()
        tokens = np.arange(12, dtype=np.int64)[None] % 96
        hf_logits = hf(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens, jnp.int32), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


def test_export_loads_in_transformers_gemma2(tmp_path):
    """The folded-q_proj + qps==head_dim encoding is exact under HF's own
    Gemma2 modeling code (softcaps, alternating windows, 4 norms)."""
    torch = pytest.importorskip("torch")
    from transformers import AutoModelForCausalLM

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, model_type="gemma2",
                      explicit_head_dim=16, hidden_act="gelu_tanh",
                      scale_embeddings=True, tie_embeddings=True,
                      sliding_window=6, window_layers=(0, 2),
                      attn_softcap=50.0, final_softcap=30.0)
    params = init_llama_params(jax.random.PRNGKey(11), cfg, dtype=jnp.float32)
    out = tmp_path / "g2"
    export_hf_llama(str(out), params, cfg)
    with torch.no_grad():
        hf = AutoModelForCausalLM.from_pretrained(
            str(out), torch_dtype=torch.float32, attn_implementation="eager").eval()
        tokens = np.arange(12, dtype=np.int64)[None] % 96
        hf_logits = hf(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama_forward(params, jnp.asarray(tokens, jnp.int32), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)
