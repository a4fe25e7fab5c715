"""MoE-llama model family (mixtral-style switch FFN in the llama block):
dense equivalence at E=1, training with the load-balance loss, expert-
parallel numerics, and the serving guard."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward

MOE_CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, num_experts=4)


def _tokens(cfg, b=2, s=24, seed=0):
    return jax.random.randint(jax.random.PRNGKey(seed), (b, s), 0, cfg.vocab_size)


def test_moe_single_expert_equals_dense():
    """E=1 routes every token (capacity >= T) through the only expert with
    gate prob exactly 1.0 — logits must equal the dense MLP model built from
    the same weights."""
    dense_cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                            num_heads=4, num_kv_heads=2, intermediate_size=64)
    moe_cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                          num_heads=4, num_kv_heads=2, intermediate_size=64,
                          num_experts=1)
    dense = init_llama_params(jax.random.PRNGKey(0), dense_cfg)
    moe = jax.tree.map(lambda x: x, dense)
    moe["blocks"] = dict(dense["blocks"])
    for k in ("gate_kernel", "up_kernel", "down_kernel"):
        moe["blocks"][k] = dense["blocks"][k][:, None]  # [L, 1, d, f]
    moe["blocks"]["router"] = jnp.zeros((2, 32, 1), jnp.float32)

    toks = _tokens(dense_cfg)
    ld, _ = llama_forward(dense, toks, dense_cfg, compute_dtype=jnp.float32)
    lm, aux = llama_forward(moe, toks, moe_cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
    assert aux["moe_aux_loss"].shape == (2,)  # per-layer switch LB loss


def test_moe_train_step_reduces_loss():
    from ssp_x_vit_tpu.llm.train import make_llama_train_step

    params = init_llama_params(jax.random.PRNGKey(1), MOE_CFG)
    opt = optax.adam(1e-2)
    step = make_llama_train_step(MOE_CFG, opt, compute_dtype=jnp.float32)
    opt_state = opt.init(params)
    toks = _tokens(MOE_CFG, seed=3)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses


def test_moe_expert_parallel_matches_single_device():
    from ssp_x_vit_tpu.parallel.llm_sharding import shard_moe_llama_params

    params = init_llama_params(jax.random.PRNGKey(2), MOE_CFG)
    toks = _tokens(MOE_CFG, seed=5)
    single, _ = llama_forward(params, toks, MOE_CFG, compute_dtype=jnp.float32)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "expert"))
    sp = shard_moe_llama_params(params, mesh)
    spec = sp["blocks"]["gate_kernel"].sharding.spec
    assert "expert" in jax.tree.leaves(tuple(spec)), spec
    sharded, _ = jax.jit(lambda p, t: llama_forward(
        p, t, MOE_CFG, compute_dtype=jnp.float32))(sp, toks)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-6, atol=1e-6)


def test_moe_expert_parallel_quantized_specs():
    """Quantized MoE pytrees shard expert-parallel too: the suffix-stripped
    specs place int8 codes / int4 nibble stacks / scale stacks on the
    'expert' axis, and the sharded quantized forward matches single-device."""
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int4
    from ssp_x_vit_tpu.parallel.llm_sharding import shard_moe_llama_params

    params = init_llama_params(jax.random.PRNGKey(21), MOE_CFG)
    qp = quantize_llm_params_int4(params, MOE_CFG)
    toks = _tokens(MOE_CFG, seed=22)
    single, _ = llama_forward(qp, toks, MOE_CFG, compute_dtype=jnp.float32)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "expert"))
    sp = shard_moe_llama_params(qp, mesh)
    for bk in ("gate_kernel_q4", "gate_kernel_scale"):
        spec = sp["blocks"][bk].sharding.spec
        assert "expert" in jax.tree.leaves(tuple(spec)), (bk, spec)
    sharded, _ = jax.jit(lambda p, t: llama_forward(
        p, t, MOE_CFG, compute_dtype=jnp.float32))(sp, toks)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-6, atol=1e-6)


def test_moe_kv_serving_matches_full_recompute():
    """KV-cached greedy on a MoE model == full-recompute greedy (the MoE
    block MLP has no cache state; only attention is cached)."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(4), MOE_CFG)
    prompt = np.asarray([3, 5, 7, 11, 13], np.int32)
    full = greedy_generate(params, MOE_CFG, prompt, max_length=16,
                           no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, MOE_CFG, prompt, max_length=16,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(kv), np.asarray(full))


def test_moe_guards():
    params = init_llama_params(jax.random.PRNGKey(3), MOE_CFG)
    with pytest.raises(ValueError, match="dense MLPs"):
        llama_forward(params, np.zeros((1, 8), np.int32), MOE_CFG,
                      collect_mlp_stats=True)


def test_moe_top2_serving_matches_full_recompute():
    """Mixtral-style top-2 routing: renormalized gates over the selected
    pair; KV-cached greedy still equals full recompute (dropless path is
    length-independent for any k)."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, num_experts=4,
                      moe_top_k=2)
    params = init_llama_params(jax.random.PRNGKey(6), cfg)
    prompt = np.asarray([2, 4, 6, 8], np.int32)
    full = greedy_generate(params, cfg, prompt, max_length=14,
                           no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(params, cfg, prompt, max_length=14,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(kv), np.asarray(full))

    # top-2 must actually mix two experts: output differs from top-1 routing
    cfg1 = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                       num_kv_heads=2, intermediate_size=64, num_experts=4)
    l2, _ = llama_forward(params, _tokens(cfg), cfg, compute_dtype=jnp.float32)
    l1, _ = llama_forward(params, _tokens(cfg), cfg1, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(l2), np.asarray(l1))


def test_moe_persistence_round_trip(tmp_path):
    """save/load preserves the MoE config fields and the expert pytree
    (f32 load is bit-exact; default bf16 load is the deployment artifact)."""
    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model, save_llm_model

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, num_experts=4,
                      moe_top_k=2)
    params = init_llama_params(jax.random.PRNGKey(7), cfg)
    save_llm_model(str(tmp_path), params, cfg)
    p2, c2 = load_llm_model(str(tmp_path), dtype=jnp.float32)
    assert c2 == cfg
    toks = _tokens(cfg, seed=9)
    l1, _ = llama_forward(params, toks, cfg, compute_dtype=jnp.float32)
    l2, _ = llama_forward(p2, toks, c2, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_moe_composition_guards():
    """MoE configs are refused by every dense-MLP-only path with a clear
    error instead of silently broadcasting 4-D expert kernels."""
    from ssp_x_vit_tpu.llm.model import llama_forward_materialized
    from ssp_x_vit_tpu.llm.pruning import materialize_llm_depth_pruning
    from ssp_x_vit_tpu.llm.quant import (
        quantize_llm_params_int4, quantize_llm_params_int8,
    )

    params = init_llama_params(jax.random.PRNGKey(8), MOE_CFG)
    with pytest.raises(ValueError, match="2SSP targets"):
        materialize_llm_depth_pruning(params, MOE_CFG, [1])
    import dataclasses
    bad = dataclasses.replace(MOE_CFG, pruned_attention_blocks=(1,))
    with pytest.raises(ValueError, match="depth materialization"):
        llama_forward_materialized(params, np.zeros((1, 8), np.int32), bad)


def test_moe_top2_load_counts_both_slots():
    """The balance statistic counts top-k MEMBERSHIP: per-expert load sums
    to k across experts (every token contributes k assignments)."""
    from ssp_x_vit_tpu.parallel.moe import MoEConfig, moe_ffn_dropless

    rng = jax.random.PRNGKey(9)
    ks = jax.random.split(rng, 5)
    d, f, E = 16, 32, 4
    p = {"router": jax.random.normal(ks[0], (d, E)),
         "gate_kernel": jax.random.normal(ks[1], (E, d, f)) * 0.05,
         "up_kernel": jax.random.normal(ks[2], (E, d, f)) * 0.05,
         "down_kernel": jax.random.normal(ks[3], (E, f, d)) * 0.05}
    x = jax.random.normal(ks[4], (2, 8, d))
    _, aux2 = moe_ffn_dropless(p, x, MoEConfig(d, f, E, top_k=2))
    np.testing.assert_allclose(float(jnp.sum(aux2["load"])), 2.0, rtol=1e-6)
    _, aux1 = moe_ffn_dropless(p, x, MoEConfig(d, f, E, top_k=1))
    np.testing.assert_allclose(float(jnp.sum(aux1["load"])), 1.0, rtol=1e-6)


def test_moe_tensor_parallel_matches_single_device():
    """ndim-aware megatron specs: MoE expert kernels shard their f axis over
    'model' (column gate/up, row down -> psum); forward == single device."""
    from ssp_x_vit_tpu.parallel import make_mesh
    from ssp_x_vit_tpu.parallel.llm_sharding import shard_llama_params

    params = init_llama_params(jax.random.PRNGKey(10), MOE_CFG)
    toks = _tokens(MOE_CFG, seed=11)
    single, _ = llama_forward(params, toks, MOE_CFG, compute_dtype=jnp.float32)

    mesh = make_mesh(model=4)  # dp=2 x tp=4
    sp = shard_llama_params(params, mesh, MOE_CFG)
    gspec = tuple(sp["blocks"]["gate_kernel"].sharding.spec)
    assert gspec[-1] == "model" and gspec[1] is None, gspec  # f sharded, E not
    sharded, _ = jax.jit(lambda p, t: llama_forward(
        p, t, MOE_CFG, compute_dtype=jnp.float32))(sp, toks)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


def test_moe_fsdp_train_step():
    """FSDP composes with MoE: expert kernels shard a dp-divisible weight
    axis over 'data'; one training step runs and keeps placements."""
    import optax

    from ssp_x_vit_tpu.parallel import make_mesh
    from ssp_x_vit_tpu.parallel.llm_sharding import (
        make_fsdp_llama_train_step, shard_llama_params_fsdp,
    )

    mesh = make_mesh(model=1)
    params = shard_llama_params_fsdp(
        init_llama_params(jax.random.PRNGKey(12), MOE_CFG), mesh)
    opt = optax.adamw(1e-3)
    step = make_fsdp_llama_train_step(mesh, MOE_CFG, opt,
                                      compute_dtype=jnp.float32)
    toks = np.asarray(_tokens(MOE_CFG, b=8, seed=13))
    params, _, loss = step(params, opt.init(params), toks)
    assert np.isfinite(float(loss))
    spec = tuple(params["blocks"]["gate_kernel"].sharding.spec)
    assert "data" in spec, spec


def test_moe_int8_kv_cache_serving():
    """int8 KV quantization touches only the attention cache, so it composes
    with the MoE MLP; generation runs and stays finite."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(14), MOE_CFG)
    out = generate_kv_scan(params, MOE_CFG, np.asarray([3, 5, 7], np.int32),
                           max_length=12, cache_dtype=jnp.int8)
    assert np.asarray(out).shape == (12,)


def test_moe_speculative_exact():
    """Speculative decoding on a MoE target is exact: the dropless MLP is
    length-independent, so the multi-token verify forward equals per-token
    decode and self-draft acceptance is 1.0 at f32."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.llm.speculative import speculative_generate

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, num_experts=4,
                      moe_top_k=2)
    params = init_llama_params(jax.random.PRNGKey(15), cfg)
    prompt = np.asarray([3, 5, 7, 11], np.int32)
    ref = generate_kv_scan(params, cfg, prompt, max_length=16,
                           cache_dtype=jnp.float32)
    out, stats = speculative_generate(params, cfg, params, cfg, prompt,
                                      max_length=16, k=3,
                                      cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert stats["acceptance_rate"] == 1.0


def test_moe_paged_matches_contiguous():
    """Paged MoE generation == contiguous KV-cached greedy (the paged MLP
    branch is the same dropless expert path)."""
    from ssp_x_vit_tpu.llm.paged import paged_generate
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(16), MOE_CFG)
    prompts = [np.asarray([3, 5, 7], np.int32),
               np.asarray([2, 4, 6, 8, 10], np.int32)]
    paged = paged_generate(params, MOE_CFG, prompts, max_new_tokens=8,
                           cache_dtype=jnp.float32, page_size=8)
    for p, out in zip(prompts, paged):
        ref = generate_kv_scan(params, MOE_CFG, p,
                               max_length=len(p) + 8,
                               cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_moe_int8_weights():
    """int8 expert weights: per-(expert, out-channel) scales fold into the
    dropless einsums; error vs dense is bounded; quantized KV-cached greedy
    equals quantized full recompute exactly (dequant is deterministic)."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(17), MOE_CFG)
    qp = quantize_llm_params_int8(params, MOE_CFG)
    assert "gate_kernel_q" in qp["blocks"]
    assert qp["blocks"]["gate_kernel_q"].dtype == jnp.int8
    assert "router" in qp["blocks"]  # router stays float

    toks = _tokens(MOE_CFG, seed=18)
    dense, _ = llama_forward(params, toks, MOE_CFG, compute_dtype=jnp.float32)
    quant, _ = llama_forward(qp, toks, MOE_CFG, compute_dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(dense - quant))) < 0.2

    prompt = np.asarray([3, 5, 7], np.int32)
    full = greedy_generate(qp, MOE_CFG, prompt, max_length=14,
                           no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(qp, MOE_CFG, prompt, max_length=14,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(kv), np.asarray(full))


def test_moe_int4_weights():
    """int4 expert weights (VERDICT r3 #7): routed expert stacks pack as
    split-half nibbles ([E, K/2, N] int8 bytes = half the int8 footprint)
    with per-(expert, out-channel) scales; moe_ffn_dropless unpacks
    in-graph. Error vs dense is bounded; int4 KV-cached greedy equals int4
    full recompute exactly."""
    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int4
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(23), MOE_CFG)
    qp = quantize_llm_params_int4(params, MOE_CFG)
    gk = params["blocks"]["gate_kernel"]
    q4 = qp["blocks"]["gate_kernel_q4"]
    assert q4.dtype == jnp.int8 and q4.shape[-2] * 2 == gk.shape[-2]
    assert q4.nbytes * 2 == gk.astype(jnp.int8).nbytes  # half of int8
    assert qp["blocks"]["gate_kernel_scale"].shape == \
        gk.shape[:-2] + gk.shape[-1:]  # per-(layer, expert, out-channel)
    assert "router" in qp["blocks"]  # router stays float

    toks = _tokens(MOE_CFG, seed=24)
    dense, _ = llama_forward(params, toks, MOE_CFG, compute_dtype=jnp.float32)
    quant, _ = llama_forward(qp, toks, MOE_CFG, compute_dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(dense - quant))) < 0.4

    prompt = np.asarray([3, 5, 7], np.int32)
    full = greedy_generate(qp, MOE_CFG, prompt, max_length=14,
                           no_repeat_ngram_size=0, compute_dtype=jnp.float32)
    kv = generate_kv_scan(qp, MOE_CFG, prompt, max_length=14,
                          cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(kv), np.asarray(full))


def test_moe_int8_pack_serve():
    """quantize -> pack -> serve composition on MoE: packing fuses the 3-D
    attention codes but leaves the 4-D expert codes unfused, and serving
    still equals the unpacked quantized model exactly."""
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
    from ssp_x_vit_tpu.llm.serve import (
        generate_kv_scan, pack_llm_params_for_serving,
    )

    params = init_llama_params(jax.random.PRNGKey(19), MOE_CFG)
    qp = quantize_llm_params_int8(params, MOE_CFG)
    packed = pack_llm_params_for_serving(qp, MOE_CFG)
    assert "qkv_kernel_q" in packed["blocks"]          # attention fused
    assert "gate_kernel_q" in packed["blocks"]         # experts NOT fused
    prompt = np.asarray([3, 5, 7], np.int32)
    a = generate_kv_scan(qp, MOE_CFG, prompt, max_length=12,
                         cache_dtype=jnp.float32)
    b = generate_kv_scan(packed, MOE_CFG, prompt, max_length=12,
                         cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
