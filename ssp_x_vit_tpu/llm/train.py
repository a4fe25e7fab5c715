"""Single-chip LLM training step (next-token cross-entropy).

The reference framework never trains LLMs (pruning + evaluation only —
src/main.py has no optimizer); this is part of the beyond-reference training
surface, sharing the NLL convention with the multi-chip pipelined step
(`parallel/pipeline.py make_pipeline_train_step`). The hot path is the
flash-attention forward + the pallas single-pass backward kernel
(ops/pallas/flash_attention.py) — measured 2.25x over XLA autodiff on the
attention fwd+bwd at calibration shapes, with no [b,h,s,s] logits
materialization (docs/tpu_notes.md).

``remat=True`` (default) checkpoints each scanned layer: the backward
recomputes layer forwards instead of storing every intermediate — the
standard memory/FLOPs trade for long-sequence training.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params, llama_forward


def next_token_loss(params: Params, tokens: jax.Array, cfg: LlamaConfig, *,
                    compute_dtype=jnp.bfloat16, remat: bool = True) -> jax.Array:
    """Mean next-token NLL over tokens [b, s] (logits in f32 for the softmax).

    Depth-materialized pruned configs train too — the 2SSP recovery-finetune
    loop (prune -> brief finetune -> serve). Their unrolled forward has no
    scanned layer to checkpoint, so ``remat`` is a no-op there.

    DeepSeek/MLA configs dispatch to the deepseek engine. No MoE aux term
    is added for them: DeepSeek-V3 balances experts via the
    e_score_correction_bias (auxiliary-loss-free strategy), not a
    load-balance loss — the bias is a buffer the V3 recipe nudges outside
    the gradient; the train steps below zero its UPDATE (not just its
    gradient: adamw's weight decay would otherwise slowly decay the
    zero-grad leaf) so it stays genuinely frozen.
    """
    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig

    aux = {}
    if isinstance(cfg, DeepseekConfig):
        from ssp_x_vit_tpu.llm.deepseek import (deepseek_forward,
                                                deepseek_forward_materialized)

        if cfg.pruned_attention_blocks:
            logits = deepseek_forward_materialized(
                params, tokens[:, :-1], cfg, compute_dtype=compute_dtype)
        else:
            logits = deepseek_forward(params, tokens[:, :-1], cfg,
                                      compute_dtype=compute_dtype,
                                      remat=remat)
    elif cfg.pruned_attention_blocks:
        from ssp_x_vit_tpu.llm.model import llama_forward_materialized

        logits = llama_forward_materialized(params, tokens[:, :-1], cfg,
                                            compute_dtype=compute_dtype)
    else:
        logits, aux = llama_forward(params, tokens[:, :-1], cfg,
                                    compute_dtype=compute_dtype, remat=remat)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    loss = nll.mean()
    if getattr(cfg, "num_experts", 0):
        # switch load-balance loss, averaged over layers (GShard/Switch
        # convention), weighted by router_aux_coef
        loss = loss + cfg.router_aux_coef * jnp.mean(aux["moe_aux_loss"])
    return loss


def _freeze_buffers(updates, cfg):
    """Zero the update of non-trained buffer leaves. Currently only
    DeepSeek's ``e_bias`` (e_score_correction_bias): its gradient is already
    zero (used only through top_k selection), but weight-decay optimizers
    emit a nonzero decay update for zero-grad leaves — masking the UPDATE is
    what actually freezes the buffer."""
    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig

    if not isinstance(cfg, DeepseekConfig):
        return updates
    return jax.tree_util.tree_map_with_path(
        lambda path, u: jnp.zeros_like(u) if any(
            getattr(k, "key", None) == "e_bias" for k in path) else u,
        updates)


def make_llama_train_step(cfg: LlamaConfig,
                          optimizer: Optional[optax.GradientTransformation] = None,
                          *, compute_dtype=jnp.bfloat16, remat: bool = True):
    """Returns jitted ``step(params, opt_state, tokens) ->
    (params, opt_state, loss)``; params/opt_state donated (updated in place
    on device — at ~1B params the pytrees never exist twice in HBM)."""
    if optimizer is None:
        optimizer = optax.adamw(1e-4)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(next_token_loss)(
            params, tokens, cfg, compute_dtype=compute_dtype, remat=remat)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, _freeze_buffers(updates, cfg))
        return params, opt_state, loss

    return step


def make_distill_train_step(teacher_params: Params, teacher_cfg: LlamaConfig,
                            student_cfg: LlamaConfig,
                            optimizer: Optional[optax.GradientTransformation] = None,
                            *, alpha: float = 0.5, temperature: float = 2.0,
                            compute_dtype=jnp.bfloat16, remat: bool = True):
    """Knowledge-distillation step for pruned-model recovery:
    ``step(student_params, opt_state, tokens) -> (student, opt_state, loss)``
    with loss = alpha * next-token CE + (1-alpha) * T^2 * KL(teacher || student)
    at softmax temperature T (Hinton KD). The dense teacher runs forward-only
    (no grads, its logits under stop_gradient); the student may be any config
    sharing the tokenizer/vocab — 2SSP width/depth-materialized, MoE, or a
    smaller architecture. Distillation typically recovers pruned-model
    quality faster than CE alone because the teacher's full distribution
    carries more signal per token than the one-hot target."""
    if optimizer is None:
        optimizer = optax.adamw(1e-4)

    def fwd(params, cfg, tokens):
        # one dispatch point for every model family; remat is a no-op for
        # the materialized (pruned) forwards, which have no scanned layer
        from ssp_x_vit_tpu.llm.generate import full_logits

        return full_logits(params, tokens, cfg, compute_dtype, remat=remat)

    def loss_fn(student, tokens):
        s_logits = fwd(student, student_cfg, tokens[:, :-1]).astype(jnp.float32)
        t_logits = jax.lax.stop_gradient(
            fwd(teacher_params, teacher_cfg, tokens[:, :-1]).astype(jnp.float32))
        logp = jax.nn.log_softmax(s_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1).mean()
        t_prob = jax.nn.softmax(t_logits / temperature, axis=-1)
        s_logp_T = jax.nn.log_softmax(s_logits / temperature, axis=-1)
        kl = jnp.mean(jnp.sum(
            t_prob * (jnp.log(t_prob + 1e-9) - s_logp_T), axis=-1))
        return alpha * ce + (1.0 - alpha) * (temperature ** 2) * kl

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(student, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(student, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, student)
        student = optax.apply_updates(
            student, _freeze_buffers(updates, student_cfg))
        return student, opt_state, loss

    return step
