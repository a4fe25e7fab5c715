"""LoRA adapters for parameter-efficient (recovery) finetuning.

The production loop this framework serves is prune -> recover -> deploy;
full-finetune recovery at ~1B scale already presses a 16 GB chip (adamw
moments alone are 2x params — docs/training.md), and at 7B it needs a pod.
LoRA shrinks the TRAINED state to rank-r adapter pairs: grads and optimizer
moments exist only for the adapters (~0.1-1% of params), the base weights
stay frozen, and after recovery the adapters merge back into the dense
kernels so every serving/quantization path sees an ordinary pytree.

Design (TPU-native):
- Adapters are stacked like the blocks they decorate ([L, d, r] / [L, r, n])
  so the train step stays ONE scan-compatible program.
- The effective weight W + (alpha/r)·A@B is materialized functionally
  inside the loss (`apply_lora`) — XLA fuses the rank-r outer product into
  the surrounding graph; the base pytree rides the step as a plain frozen
  input (NOT donated — it is reused every step), and autodiff touches only
  the adapter leaves. The adapters and their optimizer state ARE donated.
- Works on dense, GQA, width-materialized AND MoE pytrees (adapters target
  the 2-D-per-layer attention projections by default; MoE expert kernels
  stay frozen).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params
from ssp_x_vit_tpu.llm.train import next_token_loss

# The classic LoRA target set (attention projections); gate/up/down can be
# added for aggressive recovery at 3x the adapter count.
DEFAULT_TARGETS = ("q_kernel", "k_kernel", "v_kernel", "o_kernel")


def init_lora(rng: jax.Array, params: Params, rank: int = 8,
              targets: Sequence[str] = DEFAULT_TARGETS,
              dtype=jnp.float32) -> Params:
    """{target: {"a": [L, d_in, r] (gaussian), "b": [L, r, d_out] (zeros)}}.
    b=0 makes the initial adapted model EXACTLY the base model."""
    lora: Params = {}
    ks = iter(jax.random.split(rng, len(targets)))
    for t in targets:
        w = params["blocks"][t]
        if w.ndim != 3:
            raise ValueError(f"LoRA targets stacked 2-D kernels; {t} has "
                             f"shape {w.shape}")
        L, d_in, d_out = w.shape
        lora[t] = {
            "a": (jax.random.normal(next(ks), (L, d_in, rank), jnp.float32)
                  * (1.0 / rank)).astype(dtype),
            "b": jnp.zeros((L, rank, d_out), dtype),
        }
    return lora


def apply_lora(params: Params, lora: Params, *, alpha: float = 16.0) -> Params:
    """Materialize W + (alpha/r)·A@B per target; everything else is shared
    by reference (no copy)."""
    blocks = dict(params["blocks"])
    for t, ab in lora.items():
        r = ab["a"].shape[-1]
        delta = jnp.einsum("ldr,lrn->ldn", ab["a"], ab["b"]) * (alpha / r)
        blocks[t] = (blocks[t].astype(jnp.float32)
                     + delta.astype(jnp.float32)).astype(blocks[t].dtype)
    out = {k: v for k, v in params.items() if k != "blocks"}
    out["blocks"] = blocks
    return out


def merge_lora(params: Params, lora: Params, *, alpha: float = 16.0) -> Params:
    """Bake the adapters into the dense kernels — the deployment artifact
    (identical forward to the adapted model; serve/quantize/persist as an
    ordinary pytree)."""
    return apply_lora(params, lora, alpha=alpha)


def make_lora_train_step(cfg: LlamaConfig,
                         optimizer: Optional[optax.GradientTransformation] = None,
                         *, alpha: float = 16.0, compute_dtype=jnp.bfloat16,
                         remat: bool = True):
    """Returns jitted ``step(base_params, lora, opt_state, tokens) ->
    (lora, opt_state, loss)``. Only the adapters are differentiated/updated
    (lora/opt_state donated); the base pytree is a frozen, NON-donated
    input reused across steps. opt_state = optimizer.init(lora)."""
    if optimizer is None:
        optimizer = optax.adamw(1e-4)

    def loss_fn(lora, base, tokens):
        return next_token_loss(apply_lora(base, lora, alpha=alpha), tokens,
                               cfg, compute_dtype=compute_dtype, remat=remat)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(base, lora, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(lora, base, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step
