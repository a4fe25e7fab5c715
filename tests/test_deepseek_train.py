"""Training on the DeepSeek/MLA family: next_token_loss dispatch, per-layer
remat, recovery finetuning of pruned (attention-materialized) configs, KD
distillation, and the Trainer loop.

Closes the prune -> recover -> serve loop for the MLA architecture class
(the llama-family loop landed in round 3 session 1; reference recovery
finetuning context: /root/reference/src/pruning.py:286-290 saves pruned
models for downstream finetuning). No MoE aux loss for deepseek: V3 uses
the auxiliary-loss-free e_score_correction_bias strategy.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.deepseek import (
    DeepseekConfig, deepseek_generate, init_deepseek_params,
)
from ssp_x_vit_tpu.llm.train import (
    make_distill_train_step, make_llama_train_step, next_token_loss,
)


def _cfg(**over):
    kw = dict(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=4,
        q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=8,
        qk_rope_head_dim=4, v_head_dim=8, intermediate_size=48,
        moe_intermediate_size=16, n_routed_experts=4, n_shared_experts=1,
        num_experts_per_tok=2, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, first_k_dense_replace=1)
    kw.update(over)
    return DeepseekConfig(**kw)


def _batch(rng, cfg, b=2, s=16):
    return jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s + 1)), jnp.int32)


def test_deepseek_train_step_reduces_loss():
    cfg = _cfg()
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    step = make_llama_train_step(cfg, compute_dtype=jnp.float32)
    import optax

    opt_state = optax.adamw(1e-4).init(params)
    rng = np.random.default_rng(0)
    tokens = _batch(rng, cfg)  # overfit one batch
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_deepseek_remat_matches_no_remat():
    """jax.checkpoint on the scanned blocks changes memory, not math."""
    cfg = _cfg()
    params = init_deepseek_params(jax.random.PRNGKey(1), cfg)
    tokens = _batch(np.random.default_rng(1), cfg)
    loss_r, grads_r = jax.value_and_grad(next_token_loss)(
        params, tokens, cfg, compute_dtype=jnp.float32, remat=True)
    loss_n, grads_n = jax.value_and_grad(next_token_loss)(
        params, tokens, cfg, compute_dtype=jnp.float32, remat=False)
    assert abs(float(loss_r) - float(loss_n)) < 1e-6
    for a, b in zip(jax.tree.leaves(grads_r), jax.tree.leaves(grads_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_deepseek_pruned_recovery_finetune():
    """Attention-materialized pruned MLA models train through the same step
    (the 2SSP stage-2 recovery loop) and still serve afterwards."""
    from ssp_x_vit_tpu.llm.pruning_deepseek import (
        materialize_deepseek_attention_pruning,
    )

    cfg = _cfg()
    params = init_deepseek_params(jax.random.PRNGKey(2), cfg)
    pp, pcfg = materialize_deepseek_attention_pruning(params, cfg, [1])
    assert pcfg.pruned_attention_blocks == (1,)
    step = make_llama_train_step(pcfg, compute_dtype=jnp.float32)
    import optax

    opt_state = optax.adamw(1e-3).init(pp)
    tokens = _batch(np.random.default_rng(2), pcfg)
    losses = []
    for _ in range(6):
        pp, opt_state, loss = step(pp, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    out = deepseek_generate(pp, pcfg, np.asarray([3, 1, 4], np.int32),
                            max_new_tokens=4, compute_dtype=jnp.float32)
    assert np.asarray(out).shape == (7,)


def test_deepseek_distillation_step():
    """Dense MLA teacher distills into a depth-pruned MLA student."""
    from ssp_x_vit_tpu.llm.pruning_deepseek import (
        materialize_deepseek_attention_pruning,
    )

    cfg = _cfg()
    teacher = init_deepseek_params(jax.random.PRNGKey(3), cfg)
    student, scfg = materialize_deepseek_attention_pruning(teacher, cfg, [2])
    step = make_distill_train_step(teacher, cfg, scfg,
                                   compute_dtype=jnp.float32)
    import optax

    opt_state = optax.adamw(1e-3).init(student)
    tokens = _batch(np.random.default_rng(3), cfg)
    losses = []
    for _ in range(6):
        student, opt_state, loss = step(student, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_trainer_loop_deepseek():
    """The resumable Trainer (schedules, accumulation, TRAIN-LOG) drives an
    MLA config unchanged."""
    from ssp_x_vit_tpu.llm.trainer import TrainConfig, Trainer

    cfg = _cfg(n_routed_experts=0, n_shared_experts=0,
               first_k_dense_replace=3)
    params = init_deepseek_params(jax.random.PRNGKey(4), cfg)
    tc = TrainConfig(total_steps=3, accum_steps=2, learning_rate=1e-3,
                     warmup_steps=1, compute_dtype="float32", log_every=1)
    trainer = Trainer(cfg, tc)
    rng = np.random.default_rng(4)
    batches = [np.asarray(_batch(rng, cfg)) for _ in range(6)]
    params, history = trainer.fit(params, batches, verbose=False)
    assert len(history) == 3
    assert np.isfinite([h["loss"] for h in history]).all()
