"""Logical parameter accounting for (possibly pruned) ViT configs.

Counts are computed from the *logical* architecture in ``ViTConfig`` — not from
physical array sizes — because materialized models zero-pad FFN widths to a
common per-run maximum for TPU tiling. The numbers reproduce
``sum(p.numel() for p in model.parameters())`` of the reference torch models
(reference src/vit_pruning.py:82-105, 523-558), including the convention that a
depth-pruned block keeps its pre-attention LayerNorm parameters (the reference
bypass replaces only the attention module, so ``layernorm_before`` stays).
"""

from __future__ import annotations

from typing import List

from ssp_x_vit_tpu.models.vit import ViTConfig


def _attention_params(cfg: ViTConfig) -> int:
    """HF ViTAttention: q/k/v/output.dense with biases (no layernorm)."""
    d = cfg.hidden_size
    return 4 * (d * d + d)


def _ffn_params(cfg: ViTConfig, block_idx: int) -> int:
    """intermediate.dense + output.dense for one block at its logical width."""
    d = cfg.hidden_size
    f = cfg.logical_block_intermediate(block_idx)
    return (d * f + f) + (f * d + d)


def count_attention_params_per_block(cfg: ViTConfig) -> List[int]:
    """Per-block attention submodule params; 0 for depth-pruned blocks
    (reference src/vit_pruning.py:523-537)."""
    return [
        0 if i in cfg.pruned_attention_blocks else _attention_params(cfg)
        for i in range(cfg.num_layers)
    ]


def count_ffn_params_per_block(cfg: ViTConfig) -> List[int]:
    """Per-block FFN params (reference src/vit_pruning.py:540-558)."""
    return [_ffn_params(cfg, i) for i in range(cfg.num_layers)]


def count_block_params(cfg: ViTConfig) -> List[int]:
    """Per-block totals: ln1 + attention + ln2 + FFN
    (reference src/vit_pruning.py:86-98)."""
    d = cfg.hidden_size
    ln = 2 * d  # scale + bias
    attn = count_attention_params_per_block(cfg)
    ffn = count_ffn_params_per_block(cfg)
    # ln1 (layernorm_before) survives attention bypass in the reference.
    return [ln + attn[i] + ln + ffn[i] for i in range(cfg.num_layers)]


def _head_params(cfg: ViTConfig) -> int:
    d, c = cfg.hidden_size, cfg.num_classes
    if cfg.head_type == "linear":
        return d * c + c
    m = cfg.adapter_bottleneck
    return d * m + (m * c + c)  # w0 has no bias (reference adapter)


def count_total_params(cfg: ViTConfig) -> int:
    """Full model parameter count (reference src/vit_pruning.py:82-83)."""
    d = cfg.hidden_size
    patch_dim = cfg.num_channels * cfg.patch_size**2
    total = patch_dim * d + d  # patch embedding kernel + bias
    total += d  # cls token
    total += cfg.seq_len * d  # position embeddings
    total += sum(count_block_params(cfg))
    total += 2 * d  # final layernorm
    total += _head_params(cfg)
    return total


def compute_actual_sparsity(before_params: int, after_params: int) -> float:
    """(reference src/vit_pruning.py:100-105)"""
    if before_params <= 0:
        return 0.0
    return (before_params - after_params) / before_params
