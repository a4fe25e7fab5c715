"""Top-1 accuracy evaluation for ViT classifiers.

Replaces reference ``evaluate_top1`` (src/vit_pruning.py:326-373). Two modes:

- :func:`evaluate_top1` — accuracy of one model (dense/masked or materialized).
- :func:`evaluate_top1_candidates` — accuracy of C skip-mask candidates AT ONCE
  via ``vmap`` over the gate vector. This is the TPU-native replacement for the
  reference's per-candidate ``copy.deepcopy`` + full eval loop
  (src/vit_pruning.py:477-496, mask_conjunction.py:339-349): one pass over the
  data evaluates every candidate, with zero retraces.

Batches are dicts with "pixel_values" [b, H, W, C] float and "labels" [b] int.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.models.vit import ViTConfig, vit_forward, vit_forward_materialized


def _eval_dtype():
    """bf16 on TPU (the reference evaluates under autocast fp16/bf16,
    src/vit_pruning.py:339-352), fp32 elsewhere for test determinism."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


@functools.partial(jax.jit, static_argnames=("cfg", "materialized", "dtype"))
def _correct_in_batch(params, pixel_values, labels, cfg: ViTConfig,
                      materialized: bool, dtype):
    if materialized:
        logits = vit_forward_materialized(params, pixel_values, cfg, compute_dtype=dtype)
    else:
        logits, _ = vit_forward(params, pixel_values, cfg, compute_dtype=dtype)
    preds = jnp.argmax(logits, axis=-1)
    return jnp.sum(preds == labels)


def evaluate_top1(
    params,
    cfg: ViTConfig,
    batches: Iterable[dict],
    *,
    max_batches: Optional[int] = None,
    token_keep_schedule: tuple = (),
) -> float:
    """Top-1 accuracy over (up to max_batches of) a batch iterator.

    ``token_keep_schedule``: optional EViT-style static token-pruning
    schedule (models/token_pruning.py) — ((layer, kept_seq_len), ...) — for
    measuring the token-pruned accuracy/speed trade-off."""
    materialized = bool(cfg.pruned_attention_blocks)
    sched = tuple(tuple(p) for p in token_keep_schedule)
    correct = 0
    total = 0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        px = jnp.asarray(batch["pixel_values"])
        labels = jnp.asarray(batch["labels"])
        if sched:
            correct += int(_tp_correct_in_batch(params, px, labels, cfg,
                                                sched, _eval_dtype()))
        else:
            correct += int(_correct_in_batch(params, px, labels, cfg,
                                             materialized, _eval_dtype()))
        total += int(labels.shape[0])
    return correct / max(1, total)


@functools.partial(jax.jit, static_argnames=("cfg", "sched", "dtype"))
def _tp_correct_in_batch(params, pixel_values, labels, cfg: ViTConfig,
                         sched, dtype):
    """Module-level so repeated evaluate_top1 calls with the same schedule
    hit the jit cache (compiles are minutes on this host)."""
    from ssp_x_vit_tpu.models.token_pruning import vit_forward_token_pruned

    logits = vit_forward_token_pruned(params, pixel_values, cfg, sched,
                                      compute_dtype=dtype)
    return jnp.sum(jnp.argmax(logits, axis=-1) == labels)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def _candidate_correct_in_batch(params, pixel_values, labels, attn_gates, neuron_mask,
                                cfg: ViTConfig, dtype):
    """attn_gates: [C, num_layers] -> per-candidate correct counts [C]."""

    def one(gate):
        # allow_fused_attn=False: vmap over a pallas SMEM scalar operand is
        # not batched efficiently; the XLA path vmaps cleanly (one fused
        # program over the candidate axis).
        logits, _ = vit_forward(params, pixel_values, cfg, attn_gate=gate,
                                neuron_mask=neuron_mask, compute_dtype=dtype,
                                allow_fused_attn=False)
        preds = jnp.argmax(logits, axis=-1)
        return jnp.sum(preds == labels)

    return jax.vmap(one)(attn_gates)


def evaluate_top1_candidates(
    params,
    cfg: ViTConfig,
    batches: Iterable[dict],
    attn_gates: np.ndarray,
    *,
    neuron_mask=None,
    max_batches: Optional[int] = None,
) -> np.ndarray:
    """Accuracy of each row of ``attn_gates`` ([C, num_layers]) -> [C]."""
    gates = jnp.asarray(attn_gates, jnp.float32)
    if neuron_mask is None:
        neuron_mask = jnp.ones((cfg.num_layers, 1), jnp.float32)
    correct = np.zeros((gates.shape[0],), np.int64)
    total = 0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        px = jnp.asarray(batch["pixel_values"])
        labels = jnp.asarray(batch["labels"])
        correct += np.asarray(_candidate_correct_in_batch(params, px, labels, gates,
                                                          neuron_mask, cfg, _eval_dtype()))
        total += int(labels.shape[0])
    return correct / max(1, total)
