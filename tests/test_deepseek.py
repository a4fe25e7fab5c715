"""DeepSeek-V3 family: MLA attention + sigmoid-routed MoE (llm/deepseek.py).

The reference stack tops out at the Llama-2/Qwen2/Phi generation
(/root/reference/src/slicegpt.py:16-31); MLA is a new architecture class the
rebuild covers natively. Parity is pinned against transformers
DeepseekV3ForCausalLM on identical weights; the absorbed-decode serving path
is pinned against the full-recompute forward (the weight-absorption identity
must be exact up to fp error).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.deepseek import (
    DeepseekConfig, config_from_hf_deepseek, deepseek_forward,
    deepseek_generate, init_deepseek_params, load_hf_deepseek,
    mla_cache_bytes_per_token,
)

torch = pytest.importorskip("torch")

HF_BASE = dict(
    vocab_size=96, hidden_size=32, num_hidden_layers=3,
    num_attention_heads=4, num_key_value_heads=4,
    q_lora_rank=None, kv_lora_rank=16, qk_nope_head_dim=8,
    qk_rope_head_dim=4, v_head_dim=8, head_dim=4,
    intermediate_size=48, moe_intermediate_size=16,
    n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
    n_group=4, topk_group=2, norm_topk_prob=True,
    routed_scaling_factor=2.5, first_k_dense_replace=1,
    max_position_embeddings=64, tie_word_embeddings=False,
    rope_scaling=None, attention_bias=False,
)


def _save_hf_deepseek(tmp_path, seed=0, **over):
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    kw = dict(HF_BASE)
    kw.update(over)
    hf_cfg = DeepseekV3Config(**kw)
    torch.manual_seed(seed)
    with torch.no_grad():
        model = DeepseekV3ForCausalLM(hf_cfg).eval()
        # exercise a non-trivial correction bias (zero-init by default)
        for layer in model.model.layers:
            if hasattr(layer.mlp, "gate"):
                layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
        model.save_pretrained(tmp_path)
    return model


def _hf_logits(model, tokens):
    with torch.no_grad():
        return model(input_ids=torch.from_numpy(
            tokens.astype(np.int64))).logits.float().numpy()


def test_dense_mla_logits_match_hf(tmp_path):
    """first_k_dense_replace == L: pure MLA + dense GLU (no MoE in play)."""
    model = _save_hf_deepseek(tmp_path / "dense", seed=0,
                              first_k_dense_replace=3)
    params, cfg = load_hf_deepseek(str(tmp_path / "dense"))
    assert cfg.n_dense_layers == 3 and cfg.n_moe_layers == 0
    assert cfg.qk_head_dim == 12

    tokens = (np.arange(20, dtype=np.int32)[None] * 5) % 96
    ours = deepseek_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), _hf_logits(model, tokens),
                               rtol=5e-4, atol=5e-4)


def test_moe_mla_logits_match_hf(tmp_path):
    """Full V3 block mix: 1 dense + 2 MoE layers, grouped sigmoid routing
    with correction bias, shared experts, routed_scaling_factor."""
    model = _save_hf_deepseek(tmp_path / "moe", seed=1)
    params, cfg = load_hf_deepseek(str(tmp_path / "moe"))
    assert cfg.n_dense_layers == 1 and cfg.n_moe_layers == 2
    assert params["moe_blocks"]["gate_kernel"].shape == (2, 8, 32, 16)
    assert params["moe_blocks"]["shared_gate"].shape == (2, 32, 16)

    tokens = (np.arange(20, dtype=np.int32)[None] * 7) % 96
    ours = deepseek_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), _hf_logits(model, tokens),
                               rtol=5e-4, atol=5e-4)


def test_q_lora_rank_logits_match_hf(tmp_path):
    """q_lora_rank set: the compressed q path (q_a -> rmsnorm -> q_b)."""
    model = _save_hf_deepseek(tmp_path / "qlora", seed=2, q_lora_rank=12)
    params, cfg = load_hf_deepseek(str(tmp_path / "qlora"))
    assert cfg.q_lora_rank == 12
    assert params["moe_blocks"]["q_b_kernel"].shape == (2, 12, 4 * 12)

    tokens = (np.arange(16, dtype=np.int32)[None] * 3) % 96
    ours = deepseek_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), _hf_logits(model, tokens),
                               rtol=5e-4, atol=5e-4)


def test_non_interleaved_rope_matches_hf(tmp_path):
    model = _save_hf_deepseek(tmp_path / "ni", seed=3, rope_interleave=False,
                              first_k_dense_replace=3)
    params, cfg = load_hf_deepseek(str(tmp_path / "ni"))
    assert not cfg.rope_interleave

    tokens = (np.arange(16, dtype=np.int32)[None] * 11) % 96
    ours = deepseek_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), _hf_logits(model, tokens),
                               rtol=5e-4, atol=5e-4)


def test_yarn_mscale_logits_match_hf(tmp_path):
    """Deepseek-style YaRN: cos/sin carry the mscale-RATIO attention factor
    (rope.py) AND the softmax scale gains yarn_get_mscale(factor,
    mscale_all_dim)**2 (HF DeepseekV3Attention.__init__). mscale !=
    mscale_all_dim makes the two effects distinguishable — either one wrong
    breaks parity."""
    scaling = {"rope_type": "yarn", "factor": 4.0, "beta_fast": 8.0,
               "beta_slow": 1.0, "mscale": 1.2, "mscale_all_dim": 0.8,
               "original_max_position_embeddings": 16}
    model = _save_hf_deepseek(tmp_path / "yarn", seed=4,
                              rope_scaling=scaling,
                              first_k_dense_replace=3)
    params, cfg = load_hf_deepseek(str(tmp_path / "yarn"))
    assert cfg.rope_scaling is not None
    assert cfg.rope_scaling.mscale == 1.2
    assert cfg.rope_scaling.mscale_all_dim == 0.8

    tokens = (np.arange(24, dtype=np.int32)[None] * 13) % 96
    ours = deepseek_forward(params, jnp.asarray(tokens), cfg,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), _hf_logits(model, tokens),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("yarn", [False, True])
def test_absorbed_decode_matches_full_recompute(yarn):
    """Greedy generation over the compressed cache (absorbed decode) must
    equal argmax over the full-recompute forward at every step — the
    weight-absorption identity plus cache exactness. The yarn arm checks
    the scaled cos/sin tables and mscale softmax temperature thread
    identically through both paths."""
    from ssp_x_vit_tpu.llm.rope import RopeScaling

    sc = RopeScaling(rope_type="yarn", factor=4.0, mscale=1.2,
                     mscale_all_dim=0.8,
                     original_max_position_embeddings=16) if yarn else None
    cfg = DeepseekConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=4,
        q_lora_rank=12, kv_lora_rank=16, qk_nope_head_dim=8,
        qk_rope_head_dim=4, v_head_dim=8, intermediate_size=48,
        moe_intermediate_size=16, n_routed_experts=4, n_shared_experts=1,
        num_experts_per_tok=2, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, first_k_dense_replace=1,
        rope_scaling=sc)
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    prompt = np.asarray([3, 11, 7, 30], np.int32)
    n = 8

    out = deepseek_generate(params, cfg, prompt, max_new_tokens=n,
                            compute_dtype=jnp.float32)

    # reference: recompute the whole sequence each step
    seq = prompt.tolist()
    for _ in range(n):
        logits = deepseek_forward(params, jnp.asarray([seq], jnp.int32), cfg,
                                  compute_dtype=jnp.float32)
        seq.append(int(np.argmax(np.asarray(logits[0, -1]))))
    assert out.tolist() == seq


def test_batched_generate_matches_per_prompt():
    """[b, s] prompts decode together in one scan; every row equals its
    solo-generated sequence (rows never leak across the batch)."""
    cfg = DeepseekConfig(vocab_size=48, hidden_size=16, num_layers=2,
                         num_heads=2, kv_lora_rank=8, qk_nope_head_dim=4,
                         qk_rope_head_dim=4, v_head_dim=4,
                         intermediate_size=24, n_routed_experts=0)
    params = init_deepseek_params(jax.random.PRNGKey(2), cfg)
    prompts = np.asarray([[1, 5, 9], [30, 2, 17]], np.int32)
    batch = deepseek_generate(params, cfg, prompts, max_new_tokens=5,
                              compute_dtype=jnp.float32)
    for i in range(2):
        solo = deepseek_generate(params, cfg, prompts[i], max_new_tokens=5,
                                 compute_dtype=jnp.float32)
        assert batch[i].tolist() == solo.tolist()


def test_generate_eos_trim():
    cfg = DeepseekConfig(vocab_size=32, hidden_size=16, num_layers=2,
                         num_heads=2, kv_lora_rank=8, qk_nope_head_dim=4,
                         qk_rope_head_dim=4, v_head_dim=4,
                         intermediate_size=24, n_routed_experts=0)
    params = init_deepseek_params(jax.random.PRNGKey(1), cfg)
    base = deepseek_generate(params, cfg, [1, 2, 3], max_new_tokens=6,
                             compute_dtype=jnp.float32)
    eos = int(base[4])  # second generated token
    out = deepseek_generate(params, cfg, [1, 2, 3], max_new_tokens=6,
                            eos_token_id=eos, compute_dtype=jnp.float32)
    assert out.tolist() == base[:5].tolist()  # trimmed just after eos


def test_cache_footprint_head_independent():
    """The MLA cache stores kv_lora_rank + rope_dim per token regardless of
    head count — the architecture's serving selling point."""
    small = DeepseekConfig(num_heads=4, kv_lora_rank=512, qk_rope_head_dim=64)
    large = dataclasses_replace(small, num_heads=128)
    assert mla_cache_bytes_per_token(small) == \
        mla_cache_bytes_per_token(large) == (512 + 64) * 2
    # vs an equivalent MHA cache: 2 (K and V) * heads * head_dim
    mha = 2 * 128 * 128 * 2
    assert mha / mla_cache_bytes_per_token(large) > 50


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_refusals():
    with pytest.raises(ValueError, match="deepseek_v3"):
        config_from_hf_deepseek({"model_type": "llama"})
    # dynamic-NTK rope refusal rides parse_rope_scaling (test_rope_scaling)
    with pytest.raises(ValueError, match="topk_group"):
        DeepseekConfig(n_routed_experts=8, n_group=2, topk_group=4)


def test_evaluate_perplexity_deepseek():
    """evaluate_perplexity dispatches DeepseekConfig onto deepseek_forward
    (same shifted-NLL contract); attn/mlp gates ride through to the gated
    forward (pruning surgery, tests/test_deepseek_pruning.py)."""
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity

    cfg = DeepseekConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
        v_head_dim=8, intermediate_size=48, n_routed_experts=0)
    params = init_deepseek_params(jax.random.PRNGKey(1), cfg)
    ids = (np.arange(64, dtype=np.int32) * 7) % 64

    ppl = evaluate_perplexity(params, cfg, ids, seq_len=16, batch_size=2)

    logits = np.asarray(deepseek_forward(
        params, jnp.asarray(ids.reshape(4, 16)), cfg,
        compute_dtype=jnp.float32))
    lp = jax.nn.log_softmax(jnp.asarray(logits[:, :-1]), axis=-1)
    nll = -np.take_along_axis(np.asarray(lp),
                              ids.reshape(4, 16)[:, 1:, None], axis=-1)
    assert abs(ppl - float(np.exp(nll.mean()))) < 1e-4

    gated = evaluate_perplexity(params, cfg, ids, seq_len=16, batch_size=2,
                                attn_gate=np.ones(2), mlp_gate=np.ones(2))
    assert abs(gated - ppl) < 1e-4


def _moe_cfg_for_quant():
    return DeepseekConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=4,
        q_lora_rank=12, kv_lora_rank=16, qk_nope_head_dim=8,
        qk_rope_head_dim=4, v_head_dim=8, intermediate_size=48,
        moe_intermediate_size=16, n_routed_experts=4, n_shared_experts=1,
        num_experts_per_tok=2, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, first_k_dense_replace=1)


def _dequantize_deepseek(qp):
    from ssp_x_vit_tpu.llm.quant import dequantize_weight

    out = {k: v for k, v in qp.items()
           if k not in ("dense_blocks", "moe_blocks", "lm_head_q",
                        "lm_head_scale")}
    if "lm_head_q" in qp:
        out["lm_head"] = dequantize_weight(qp["lm_head_q"],
                                           qp["lm_head_scale"], jnp.float32)
    for grp in ("dense_blocks", "moe_blocks"):
        if grp not in qp:
            continue
        out[grp] = {}
        for k, v in qp[grp].items():
            if k.endswith("_q"):
                out[grp][k[:-2]] = dequantize_weight(
                    v, qp[grp][k[:-2] + "_scale"], jnp.float32)
            elif not k.endswith("_scale"):
                out[grp][k] = v
    return out


def test_int8_weights_deepseek_matches_dequantized():
    """int8-in-graph (per-out-channel scale epilogues in _mm, _kv_b_matrix,
    and the expert-einsum epilogues) must equal running on host-dequantized
    weights — scales commute with every contraction, including the absorbed
    per-head folds. Greedy generation (prefill full forward + absorbed
    decode scan) must therefore match EXACTLY at f32."""
    from ssp_x_vit_tpu.llm.quant import quantize_deepseek_params_int8

    cfg = _moe_cfg_for_quant()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_deepseek_params_int8(params, cfg)
    deq = _dequantize_deepseek(qp)
    prompt = np.asarray([5, 9, 2, 7], np.int32)
    out_q = deepseek_generate(qp, cfg, prompt, max_new_tokens=8,
                              compute_dtype=jnp.float32)
    out_d = deepseek_generate(deq, cfg, prompt, max_new_tokens=8,
                              compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_d))


def test_int8_weights_deepseek_logits_close_to_dense():
    from ssp_x_vit_tpu.llm.quant import quantize_deepseek_params_int8

    cfg = _moe_cfg_for_quant()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_deepseek_params_int8(params, cfg)
    toks = jnp.asarray((np.arange(16, dtype=np.int32)[None] * 5) % 64)
    dense = np.asarray(deepseek_forward(params, toks, cfg,
                                        compute_dtype=jnp.float32))
    quant = np.asarray(deepseek_forward(qp, toks, cfg,
                                        compute_dtype=jnp.float32))
    rel = np.linalg.norm(quant - dense) / np.linalg.norm(dense)
    assert rel < 0.15, rel


def test_int8_weights_deepseek_paged_server():
    """Quantized MLA weights through the paged continuous-batching server:
    greedy == deepseek_generate on the same quantized pytree (f32 pools)."""
    from ssp_x_vit_tpu.llm.paged_mla import MLAPagedServer
    from ssp_x_vit_tpu.llm.quant import quantize_deepseek_params_int8

    cfg = _moe_cfg_for_quant()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_deepseek_params_int8(params, cfg)
    prompt = np.asarray([3, 5, 8], np.int32)
    ref = deepseek_generate(qp, cfg, prompt, max_new_tokens=6,
                            compute_dtype=jnp.float32)
    srv = MLAPagedServer(qp, cfg, max_batch=1, num_pages=16, page_size=4,
                         max_context=32, cache_dtype=jnp.float32)
    rid = srv.add_request(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(srv.run()[rid], np.asarray(ref))


def test_hf_export_round_trip(tmp_path):
    """export_hf_deepseek inverts load_hf_deepseek: exported checkpoints
    reload with identical f32 logits through BOTH our loader and
    transformers DeepseekV3ForCausalLM (MoE + q_lora + shared experts)."""
    from ssp_x_vit_tpu.llm.deepseek import export_hf_deepseek

    cfg = DeepseekConfig(
        vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
        q_lora_rank=12, kv_lora_rank=16, qk_nope_head_dim=8,
        qk_rope_head_dim=4, v_head_dim=8, intermediate_size=48,
        moe_intermediate_size=16, n_routed_experts=8, n_shared_experts=1,
        num_experts_per_tok=2, n_group=4, topk_group=2,
        routed_scaling_factor=2.5, first_k_dense_replace=1)
    params = init_deepseek_params(jax.random.PRNGKey(3), cfg)
    out = str(tmp_path / "export")
    export_hf_deepseek(out, params, cfg)

    tokens = (np.arange(20, dtype=np.int32)[None] * 7) % 96
    ours = np.asarray(deepseek_forward(params, jnp.asarray(tokens), cfg,
                                       compute_dtype=jnp.float32))

    p2, cfg2 = load_hf_deepseek(out)
    assert cfg2 == cfg
    back = np.asarray(deepseek_forward(p2, jnp.asarray(tokens), cfg2,
                                       compute_dtype=jnp.float32))
    np.testing.assert_allclose(back, ours, rtol=1e-6, atol=1e-6)

    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(out).eval()
    np.testing.assert_allclose(_hf_logits(model, tokens), ours,
                               rtol=5e-4, atol=5e-4)


def test_hf_export_dense_only_and_refusals(tmp_path):
    from ssp_x_vit_tpu.llm.deepseek import export_hf_deepseek
    from ssp_x_vit_tpu.llm.quant import quantize_deepseek_params_int8

    cfg = DeepseekConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
        v_head_dim=8, intermediate_size=48, n_routed_experts=0)
    params = init_deepseek_params(jax.random.PRNGKey(4), cfg)
    out = str(tmp_path / "dense")
    export_hf_deepseek(out, params, cfg)
    p2, cfg2 = load_hf_deepseek(out)
    assert cfg2.n_moe_layers == 0
    tokens = (np.arange(12, dtype=np.int32)[None] * 5) % 64
    np.testing.assert_allclose(
        np.asarray(deepseek_forward(p2, jnp.asarray(tokens), cfg2,
                                    compute_dtype=jnp.float32)),
        np.asarray(deepseek_forward(params, jnp.asarray(tokens), cfg,
                                    compute_dtype=jnp.float32)),
        rtol=1e-6, atol=1e-6)

    qp = quantize_deepseek_params_int8(params, cfg)
    with pytest.raises(ValueError, match="no HF encoding"):
        export_hf_deepseek(str(tmp_path / "q"), qp, cfg)


def test_native_save_load_quantized(tmp_path):
    """save_deepseek_model/load_deepseek_model: int8 pytrees round-trip
    losslessly (codes keep dtype), greedy generation identical."""
    from ssp_x_vit_tpu.llm.deepseek import (load_deepseek_model,
                                            save_deepseek_model)
    from ssp_x_vit_tpu.llm.quant import quantize_deepseek_params_int8

    cfg = _moe_cfg_for_quant()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_deepseek_params_int8(params, cfg)
    save_deepseek_model(str(tmp_path / "m"), qp, cfg)
    p2, cfg2 = load_deepseek_model(str(tmp_path / "m"), dtype=jnp.float32)
    assert cfg2 == cfg
    assert p2["moe_blocks"]["o_kernel_q"].dtype == jnp.int8
    prompt = np.asarray([5, 9, 2, 7], np.int32)
    ref = deepseek_generate(qp, cfg, prompt, max_new_tokens=6,
                            compute_dtype=jnp.float32)
    out = deepseek_generate(p2, cfg2, prompt, max_new_tokens=6,
                            compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_main_llm_loader_dispatches_deepseek(tmp_path):
    """main_llm.load_model (the CLI + serve_http loader): tiny-random
    alias, exported HF dirs (model_type dispatch), and native npz dirs
    (kv_lora_rank sniff) all land on the deepseek loaders."""
    import sys
    import types

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from main_llm import load_model

    from ssp_x_vit_tpu.llm.deepseek import (export_hf_deepseek,
                                            save_deepseek_model)

    params, cfg = load_model(
        types.SimpleNamespace(model="tiny-random-deepseek", seed=0))
    assert isinstance(cfg, DeepseekConfig)

    export_hf_deepseek(str(tmp_path / "hf"), params, cfg)
    _, c2 = load_model(
        types.SimpleNamespace(model=str(tmp_path / "hf"), seed=0))
    assert c2 == cfg

    save_deepseek_model(str(tmp_path / "npz"), params, cfg)
    _, c3 = load_model(
        types.SimpleNamespace(model=str(tmp_path / "npz"), seed=0))
    assert c3 == cfg
