"""DeepSeek/MLA parallelism on the virtual 8-device mesh: latent-ring
sequence parallelism, FSDP training, dp x pp x tp pipeline (VERDICT r3 #6 —
the llama family had all four modes, MLA had tp only)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream
from ssp_x_vit_tpu.llm.deepseek import (DeepseekConfig, deepseek_forward,
                                        init_deepseek_params)
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.parallel import make_mesh


def _moe_cfg():
    """Tiny V3-shaped config: 1 dense + 2 MoE layers, shared expert,
    group-limited routing, q-lora."""
    return DeepseekConfig(vocab_size=64, hidden_size=16, num_layers=3,
                          num_heads=4, kv_lora_rank=8, qk_nope_head_dim=4,
                          qk_rope_head_dim=4, v_head_dim=4,
                          intermediate_size=24, n_routed_experts=4,
                          n_shared_experts=1, num_experts_per_tok=2,
                          moe_intermediate_size=12, q_lora_rank=8,
                          first_k_dense_replace=1, routed_scaling_factor=1.5)


def _dense_cfg():
    """Dense-MLP MLA config (first_k == num_layers): the pipeline target."""
    return DeepseekConfig(vocab_size=64, hidden_size=16, num_layers=4,
                          num_heads=4, kv_lora_rank=8, qk_nope_head_dim=4,
                          qk_rope_head_dim=4, v_head_dim=4,
                          intermediate_size=24, n_routed_experts=0)


def test_deepseek_seq_parallel_perplexity_matches_single():
    """The MLA latent ring (compressed c/k_rot chunks rotating, per-hop kv_b
    re-expansion) reproduces the single-device streaming perplexity."""
    from ssp_x_vit_tpu.parallel.ring_attention import \
        evaluate_perplexity_seq_parallel

    cfg = _moe_cfg()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    stream = synthetic_token_stream(64 * 3, cfg.vocab_size, seed=3)
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=64,
                                     enable_tqdm=False)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ppl_sp = evaluate_perplexity_seq_parallel(params, cfg, mesh, stream,
                                              seq_len=64)
    assert abs(np.log(ppl_sp) - np.log(ppl_single)) < 1e-3


def test_deepseek_fsdp_train_step_matches_single_device():
    """FSDP over the MLA pytree: dense_blocks/moe_blocks stacks shard their
    largest weight axis over 'data'; one step matches the single-device
    deepseek train step and e_bias stays frozen (update masked, not just
    zero-grad)."""
    from ssp_x_vit_tpu.llm.train import make_llama_train_step
    from ssp_x_vit_tpu.parallel.llm_sharding import (
        fsdp_llama_param_specs_like, make_fsdp_llama_train_step,
        shard_llama_params_fsdp,
    )

    cfg = _moe_cfg()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    # snapshot BEFORE sharding: device_put may alias buffers that the fsdp
    # step's donation then deletes
    e0 = np.asarray(params["moe_blocks"]["e_bias"])
    toks = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (8, 24), 0, 64), np.int32)

    opt = optax.adamw(1e-2)
    single = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    p1, _, loss1 = single(jax.tree.map(jnp.copy, params), opt.init(params),
                          toks)

    mesh = make_mesh(model=1)  # pure fsdp over data=8
    sp = shard_llama_params_fsdp(params, mesh)
    # the MoE expert stacks [L, E, d, f] must actually shard, not replicate
    espec = sp["moe_blocks"]["gate_kernel"].sharding.spec
    assert "data" in jax.tree.leaves(tuple(espec)), espec
    fsdp = make_fsdp_llama_train_step(mesh, cfg, opt,
                                      compute_dtype=jnp.float32)
    p2, s2, loss2 = fsdp(sp, opt.init(sp), toks)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # e_bias frozen through the fsdp step (weight decay masked out)
    np.testing.assert_array_equal(np.asarray(p2["moe_blocks"]["e_bias"]), e0)
    # placement survives the step (compare modulo trailing-None trimming)
    specs = fsdp_llama_param_specs_like(p2, mesh.shape["data"])
    want = tuple(specs["moe_blocks"]["gate_kernel"])
    got = tuple(p2["moe_blocks"]["gate_kernel"].sharding.spec)
    got = got + (None,) * (len(want) - len(got))
    assert got == want, got


def test_deepseek_pipeline_forward_matches_single():
    """dp x pp x tp pipelined MLA forward == single-device deepseek_forward
    (f32): column-parallel q/kv_b head groups + replicated latent,
    row-parallel o/down psums, GPipe microbatch rotation."""
    from ssp_x_vit_tpu.parallel.deepseek_parallel import (
        make_deepseek_pipeline_forward, shard_deepseek_params_pipeline)

    cfg = _dense_cfg()
    params = init_deepseek_params(jax.random.PRNGKey(2), cfg)
    toks = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (4, 12), 0, 64), np.int32)
    ref = deepseek_forward(params, jnp.asarray(toks), cfg,
                           compute_dtype=jnp.float32)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "pipe", "model"))
    sharded = shard_deepseek_params_pipeline(params, mesh, cfg)
    fwd = jax.jit(make_deepseek_pipeline_forward(mesh, cfg,
                                                 num_microbatches=2))
    out = fwd(sharded, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_deepseek_pipeline_train_step_runs():
    from ssp_x_vit_tpu.parallel.deepseek_parallel import (
        make_deepseek_pipeline_train_step, shard_deepseek_params_pipeline)

    cfg = _dense_cfg()
    params = init_deepseek_params(jax.random.PRNGKey(4), cfg)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "pipe", "model"))
    sharded = shard_deepseek_params_pipeline(params, mesh, cfg)
    opt = optax.adamw(1e-3)
    step = make_deepseek_pipeline_train_step(mesh, cfg, opt,
                                             num_microbatches=2)
    toks = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (4, 12), 0, 64), np.int32)
    p, s, loss = step(sharded, opt.init(sharded), jnp.asarray(toks))
    assert np.isfinite(float(loss))
    p, s, loss2 = step(p, s, jnp.asarray(toks))
    assert float(loss2) < float(loss)  # one adamw step on a tiny model moves


def test_deepseek_pipeline_moe_refusal():
    """Routed-expert configs are refused with the expert-parallel rationale
    (the llama pipeline refuses MoE the same way)."""
    from ssp_x_vit_tpu.parallel.deepseek_parallel import \
        make_deepseek_pipeline_forward

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "pipe", "model"))
    with pytest.raises(ValueError, match="expert-parallel"):
        make_deepseek_pipeline_forward(mesh, _moe_cfg(), num_microbatches=2)
