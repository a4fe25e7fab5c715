"""Head / full-model finetuning with optax (reference ``maybe_finetune_head``,
experiments/vit_pruning/auto_2ssp.py:231-290 — AdamW, cross-entropy, autocast).

TPU-native: one jitted train step (donated params/opt state), data-parallel
over the mesh ``data`` axis when run under shardings, bf16 compute with fp32
params/optimizer state. ``trainable="head"`` freezes the backbone via masked
gradients (exactly the reference's requires_grad freeze).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import optax

from ssp_x_vit_tpu.models.vit import Params, ViTConfig, vit_forward, vit_forward_materialized


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def trainable_mask(params: Params, trainable: str) -> Params:
    """optax mask pytree: True = train. 'head' trains only the classifier."""
    if trainable == "all":
        return jax.tree.map(lambda _: True, params)
    if trainable == "head":
        return {
            k: (jax.tree.map(lambda _: True, v) if k == "head" else jax.tree.map(lambda _: False, v))
            for k, v in params.items()
        }
    raise ValueError(f"unknown trainable spec {trainable}")


def make_optimizer(params: Params, lr: float = 5e-5, weight_decay: float = 0.01,
                   trainable: str = "head") -> optax.GradientTransformation:
    opt = optax.adamw(lr, weight_decay=weight_decay)
    mask = trainable_mask(params, trainable)
    return optax.chain(
        optax.masked(opt, mask),
        # Hard-zero frozen grads so frozen params cannot drift.
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda t: not t, mask)),
    )


def make_train_step(cfg: ViTConfig, optimizer: optax.GradientTransformation,
                    compute_dtype=jnp.bfloat16):
    """Returns jitted step(params, opt_state, pixel_values, labels) ->
    (params, opt_state, loss)."""
    materialized = bool(cfg.pruned_attention_blocks)

    def loss_fn(params, pixel_values, labels):
        if materialized:
            logits = vit_forward_materialized(params, pixel_values, cfg, compute_dtype=compute_dtype,
                                              allow_fused_attn=False)
        else:
            # allow_fused_attn=False: the pallas fused-attn/ffn blocks have
            # no JVP rule — grad'd forwards must take the XLA path.
            logits, _ = vit_forward(params, pixel_values, cfg, compute_dtype=compute_dtype,
                                    allow_fused_attn=False)
        return cross_entropy_loss(logits, labels)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, pixel_values, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, pixel_values, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def finetune(
    params: Params,
    cfg: ViTConfig,
    batches_fn,
    *,
    epochs: int = 1,
    lr: float = 5e-5,
    trainable: str = "head",
    compute_dtype=jnp.bfloat16,
    verbose: bool = True,
) -> Params:
    """Run finetuning; ``batches_fn()`` yields dicts per epoch (re-iterable)."""
    optimizer = make_optimizer(params, lr=lr, trainable=trainable)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer, compute_dtype=compute_dtype)

    n_train = sum(
        int(x.size) for m, x in zip(jax.tree.leaves(trainable_mask(params, trainable)),
                                    jax.tree.leaves(params)) if m
    )
    if verbose:
        print(f"[INFO] Fine-tuning ({trainable}) for {epochs} epoch(s) with "
              f"{n_train/1e6:.2f}M trainable params")

    for epoch in range(epochs):
        running, nsteps = 0.0, 0
        for batch in batches_fn():
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(batch["pixel_values"]), jnp.asarray(batch["labels"])
            )
            running += float(loss)
            nsteps += 1
        if verbose:
            print(f"[INFO] Epoch {epoch+1}/{epochs} done. Mean loss: {running/max(1,nsteps):.4f}")
    if verbose:
        print("[INFO] Fine-tuning complete.")
    return params


def make_distill_train_step(teacher_params: Params, teacher_cfg: ViTConfig,
                            student_cfg: ViTConfig,
                            optimizer: optax.GradientTransformation,
                            *, alpha: float = 0.5, temperature: float = 2.0,
                            compute_dtype=jnp.bfloat16):
    """Knowledge-distillation recovery for a pruned ViT:
    ``step(student, opt_state, pixel_values, labels) -> (student, opt_state,
    loss)`` with loss = alpha * CE(labels) + (1-alpha) * T^2 * KL(teacher ||
    student) at softmax temperature T (Hinton KD). The dense teacher runs
    forward-only under stop_gradient; the student may be width/depth-
    materialized or any config sharing the label space. Complements the
    reference's CE-only recovery (experiments/vit_pruning/auto_2ssp.py:231-290)
    — the teacher's full class distribution carries more signal per image
    than the one-hot target, which matters most right after pruning."""

    def fwd(params, cfg, pixel_values):
        # XLA path: the pallas fused blocks have no JVP rule (student side
        # is grad'd; keeping both sides on one path also keeps the logit
        # numerics comparable).
        if cfg.pruned_attention_blocks:
            return vit_forward_materialized(params, pixel_values, cfg,
                                            compute_dtype=compute_dtype,
                                            allow_fused_attn=False)
        logits, _ = vit_forward(params, pixel_values, cfg,
                                compute_dtype=compute_dtype,
                                allow_fused_attn=False)
        return logits

    def loss_fn(student, pixel_values, labels):
        s_logits = fwd(student, student_cfg, pixel_values).astype(jnp.float32)
        t_logits = jax.lax.stop_gradient(
            fwd(teacher_params, teacher_cfg, pixel_values).astype(jnp.float32))
        ce = cross_entropy_loss(s_logits, labels)
        t_prob = jax.nn.softmax(t_logits / temperature, axis=-1)
        s_logp_T = jax.nn.log_softmax(s_logits / temperature, axis=-1)
        kl = jnp.mean(jnp.sum(
            t_prob * (jnp.log(t_prob + 1e-9) - s_logp_T), axis=-1))
        return alpha * ce + (1.0 - alpha) * (temperature ** 2) * kl

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(student, opt_state, pixel_values, labels):
        loss, grads = jax.value_and_grad(loss_fn)(student, pixel_values, labels)
        updates, opt_state = optimizer.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        return student, opt_state, loss

    return step


def make_lora_train_step(cfg: ViTConfig,
                         optimizer: optax.GradientTransformation,
                         *, alpha: float = 16.0, compute_dtype=jnp.bfloat16):
    """LoRA finetuning for the ViT: ``step(base, lora, opt_state,
    pixel_values, labels) -> (lora, opt_state, loss)``. Reuses the generic
    stacked-adapter machinery from llm/lora.py (apply_lora works on any
    pytree with a "blocks" dict); the classic ViT targets are the fused
    qkv and output projections. Backbone stays frozen; only the rank-r
    adapters carry grads/optimizer state — the parameter-efficient
    counterpart of trainable="all" (docs/training.md)."""
    from ssp_x_vit_tpu.llm.lora import apply_lora

    materialized = bool(cfg.pruned_attention_blocks)

    def loss_fn(lora, base, pixel_values, labels):
        p = apply_lora(base, lora, alpha=alpha)
        if materialized:
            logits = vit_forward_materialized(p, pixel_values, cfg,
                                              compute_dtype=compute_dtype,
                                              allow_fused_attn=False)
        else:
            logits, _ = vit_forward(p, pixel_values, cfg,
                                    compute_dtype=compute_dtype,
                                    allow_fused_attn=False)
        return cross_entropy_loss(logits, labels)

    @jax.jit
    def step(base, lora, opt_state, pixel_values, labels):
        loss, grads = jax.value_and_grad(loss_fn)(lora, base, pixel_values,
                                                  labels)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step


VIT_LORA_TARGETS = ("qkv_kernel", "proj_kernel")
