"""Pruning surgery for the DeepSeek/MLA family — the MLA analogues of the
llama-family materializations in llm/pruning.py.

The reference framework never reaches this architecture (its adapters stop
at llama-2/mistral/qwen2.5/phi, /root/reference/src/slicegpt.py:16-31), but
its pruning METHODS are architecture-generic over "blocks with an attention
submodule and an MLP submodule":

- 2SSP stage-1 (FFN neuron width, reference src/pruning.py:260-286) applies
  to the dense GLU MLPs (every layer of an n_routed_experts=0 config).
- 2SSP stage-2 / blockpruner / window_based / shortGPT / EvoPress operate on
  per-block gates and block outputs — the MLA attention submodule gates
  exactly like MHA (llm/deepseek.py deepseek_forward attn_gate/mlp_gate).

What "remove the attention submodule" means for MLA: drop ln1 + the whole
low-rank query path (q or q_a/q_a_norm/q_b) + kv_a (+norm) + kv_b + o —
the reference's delete-q/k/v/o (src/utilities.py:486-503) generalized to
the factored projections. The compressed-cache serving path skips pruned
layers entirely (deepseek_forward_materialized / deepseek_generate).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig, Params

_ATTN_KEYS = ("ln1", "q_kernel", "q_a_kernel", "q_a_norm", "q_b_kernel",
              "kv_a_kernel", "kv_a_norm", "kv_b_kernel", "o_kernel")
_VARIANT_SUFFIXES = ("", "_q", "_q4", "_scale")


def count_main_params_deepseek(cfg: DeepseekConfig) -> Tuple[int, int, int]:
    """(main_layers_total, attn_per_block, mlp_per_block) for dense configs
    — the 2SSP budget arithmetic (cf. pruning.count_main_params). Attention
    counts the full MLA factorization including its internal RMSNorms
    (q_a_layernorm / kv_a_layernorm live inside HF's self_attn)."""
    if cfg.n_routed_experts:
        raise ValueError("2SSP accounting targets dense-GLU configs; MoE "
                         "blocks have no single FFN width to prune")
    d, nq = cfg.hidden_size, cfg.num_heads
    kvr, rd = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    if cfg.q_lora_rank is None:
        q = d * nq * cfg.qk_head_dim
    else:
        q = d * cfg.q_lora_rank + cfg.q_lora_rank \
            + cfg.q_lora_rank * nq * cfg.qk_head_dim
    attn = (q + d * (kvr + rd) + kvr
            + kvr * nq * (cfg.qk_nope_head_dim + cfg.v_head_dim)
            + nq * cfg.v_head_dim * d)
    mlp = 3 * d * cfg.effective_intermediate
    per_block_other = 2 * d  # ln1 + ln2 RMS scales
    main = cfg.num_layers * (attn + mlp + per_block_other)
    main -= len(cfg.pruned_attention_blocks) * attn
    return main, attn, mlp


def materialize_deepseek_width_pruning(
    params: Params, cfg: DeepseekConfig, keep_indices: Sequence[np.ndarray]
) -> Tuple[Params, DeepseekConfig]:
    """Slice gate/up columns and down rows to the kept FFN neurons per block
    (2SSP stage-1 materialization; cf. materialize_llm_width_pruning).
    Dense-GLU configs only; uniform keep count across layers."""
    if cfg.n_moe_layers:
        raise ValueError("stage-1 width pruning targets dense GLU MLPs; "
                         "this config has MoE layers")
    keeps = [np.asarray(k) for k in keep_indices]
    n_keep = len(keeps[0])
    assert all(len(k) == n_keep for k in keeps), \
        "2SSP stage-1 keeps a uniform width"
    idx = jnp.asarray(np.stack(keeps).astype(np.int32))
    blocks = dict(params["dense_blocks"])
    blocks["gate_kernel"] = jnp.take_along_axis(
        blocks["gate_kernel"], idx[:, None, :], axis=2)
    blocks["up_kernel"] = jnp.take_along_axis(
        blocks["up_kernel"], idx[:, None, :], axis=2)
    blocks["down_kernel"] = jnp.take_along_axis(
        blocks["down_kernel"], idx[:, :, None], axis=1)
    new_params = dict(params)
    new_params["dense_blocks"] = blocks
    return new_params, dataclasses.replace(cfg, pruned_intermediate_size=n_keep)


def _take_layers(blocks: dict, keys: Sequence[str], keep_local) -> dict:
    out = dict(blocks)
    idx = jnp.asarray(keep_local, jnp.int32)
    for base in keys:
        for suf in _VARIANT_SUFFIXES:
            k = base + suf
            if k in out:
                out[k] = jnp.take(out[k], idx, axis=0)
    return out


def materialize_deepseek_attention_pruning(
    params: Params, cfg: DeepseekConfig, blocks_to_prune: Sequence[int]
) -> Tuple[Params, DeepseekConfig]:
    """Physically drop pruned blocks' MLA attention weights (ln1 + q path +
    kv_a/kv_b + o), compacting each group's stacks independently. The result
    runs through deepseek_forward_materialized / deepseek_generate."""
    pruned = tuple(sorted(set(int(i) for i in blocks_to_prune)))
    if not pruned:
        return params, cfg
    if cfg.pruned_attention_blocks:
        raise ValueError("attention pruning already materialized")
    if max(pruned) >= cfg.num_layers or min(pruned) < 0:
        raise ValueError(f"block index out of range in {pruned}")
    nk = cfg.n_dense_layers
    new_params = dict(params)
    if "dense_blocks" in params:
        keep = [i for i in range(nk) if i not in pruned]
        new_params["dense_blocks"] = _take_layers(
            params["dense_blocks"], _ATTN_KEYS, keep)
    if "moe_blocks" in params:
        keep = [i - nk for i in range(nk, cfg.num_layers) if i not in pruned]
        new_params["moe_blocks"] = _take_layers(
            params["moe_blocks"], _ATTN_KEYS, keep)
    return new_params, dataclasses.replace(cfg, pruned_attention_blocks=pruned)


def materialize_deepseek_block_removal(
    params: Params, cfg: DeepseekConfig, blocks_to_remove: Sequence[int]
) -> Tuple[Params, DeepseekConfig]:
    """Physically drop ENTIRE blocks (attention + MLP) — the deployment
    artifact for the depth baselines (cf. materialize_llm_block_removal).
    Group membership is preserved: surviving dense-prefix layers stay the
    dense prefix (first_k_dense_replace shrinks to the survivor count)."""
    removed = tuple(sorted(set(int(i) for i in blocks_to_remove)))
    if not removed:
        return params, cfg
    if cfg.pruned_attention_blocks:
        raise ValueError("materialize block removal BEFORE attention-only "
                         "materialization (stacks are uniform only while "
                         "every block still has attention)")
    if max(removed) >= cfg.num_layers or min(removed) < 0:
        raise ValueError(f"block index out of range in {removed}")
    if len(removed) == cfg.num_layers:
        raise ValueError("cannot remove every block")
    nk = cfg.n_dense_layers
    new_params = dict(params)

    def compact(group_key, local_keep):
        if not local_keep:
            new_params.pop(group_key, None)
            return
        blocks = params[group_key]
        idx = jnp.asarray(local_keep, jnp.int32)
        new_params[group_key] = {k: jnp.take(v, idx, axis=0)
                                 for k, v in blocks.items()}

    dense_keep = [i for i in range(nk) if i not in removed]
    moe_keep = [i - nk for i in range(nk, cfg.num_layers) if i not in removed]
    if "dense_blocks" in params:
        compact("dense_blocks", dense_keep)
    if "moe_blocks" in params:
        compact("moe_blocks", moe_keep)

    n_layers = len(dense_keep) + len(moe_keep)
    new_cfg = dataclasses.replace(
        cfg, num_layers=n_layers,
        first_k_dense_replace=len(dense_keep) if cfg.n_routed_experts else 0)
    return new_params, new_cfg
