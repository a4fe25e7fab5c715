"""Stage-1 FFN width pruning: importance, selection, materialization.

Reference semantics (src/vit_pruning.py:112-319):

- importance of neuron j in block b = mean over calibration images of the L2
  norm over tokens of its intermediate activation;
- keep the top (d_int - n_prune) neurons by importance (ties broken like a
  descending argsort), respecting a ``min_remaining`` floor;
- materially rebuild fc1 rows (+bias) and fc2 columns.

TPU-native differences: the importance statistics come out of the forward pass
itself (``collect_ffn_stats`` — one batched pass, no hooks, all blocks at
once), and materialization is a single gather per weight with zero-padding to a
common physical width so blocks stay stacked/scannable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.models.vit import Params, ViTConfig, vit_forward


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_ffn_sumsq(params, pixel_values, cfg: ViTConfig):
    _, aux = vit_forward(params, pixel_values, cfg, collect_ffn_stats=True)
    return aux["ffn_stats"]  # [num_layers, batch, d_int] fp32 sum-over-tokens of act^2


def compute_ffn_activation_importance(
    params: Params,
    cfg: ViTConfig,
    batches: Iterable[dict],
    *,
    batch_limit: Optional[int] = None,
) -> np.ndarray:
    """Per-neuron importance, shape [num_layers, d_int] (fp32).

    = mean over images of sqrt(sum over tokens of activation^2), exactly the
    reference's hook metric (src/vit_pruning.py:143-163) computed as a fused
    side-output of the batched forward.
    """
    sums: Optional[np.ndarray] = None
    count = 0
    for i, batch in enumerate(batches):
        if batch_limit is not None and i >= batch_limit:
            break
        px = jnp.asarray(batch["pixel_values"])
        sumsq = _batch_ffn_sumsq(params, px, cfg)  # [L, b, F]
        per_sample_l2 = jnp.sqrt(sumsq)
        acc = np.asarray(jnp.sum(per_sample_l2, axis=1))  # [L, F]
        sums = acc if sums is None else sums + acc
        count += int(px.shape[0])
    if sums is None:
        return np.zeros((cfg.num_layers, cfg.intermediate_size), np.float32)
    return (sums / max(1, count)).astype(np.float32)


def weight_l1_importance(params: Params) -> np.ndarray:
    """Fallback importance: per-neuron L1 of fc1 weights
    (reference ``W.abs().sum(dim=1)``, src/vit_pruning.py:267). [L, F]."""
    fc1 = np.asarray(params["blocks"]["fc1_kernel"], np.float32)  # [L, d, F]
    return np.abs(fc1).sum(axis=1)


@dataclasses.dataclass
class WidthPruneResult:
    keep_indices: List[np.ndarray]       # per block, sorted ascending kept neuron ids
    pruned_indices: List[List[int]]      # per block, pruned neuron ids
    prune_masks: List[List[int]]         # per block, 0/1 list (1 = pruned), len d_int
    n_pruned_per_block: List[int]


def select_keep_indices(
    importance: np.ndarray,
    *,
    sparsity: Optional[float] = None,
    n_to_prune_per_block: Optional[Sequence[int]] = None,
    min_remaining: int = 256,
    verbose: bool = True,
) -> WidthPruneResult:
    """Choose kept neurons per block (reference src/vit_pruning.py:273-295).

    ``importance`` is [num_layers, d_int]. Provide either ``sparsity`` or
    ``n_to_prune_per_block`` (the latter wins, as in the reference).
    """
    L, F = importance.shape
    if n_to_prune_per_block is not None and len(n_to_prune_per_block) != L:
        raise ValueError("n_to_prune_per_block length must match number of blocks")
    if n_to_prune_per_block is None:
        if sparsity is None:
            raise ValueError("Provide either sparsity or n_to_prune_per_block")
        if not (0.0 <= sparsity < 1.0):
            raise AssertionError("sparsity must be in [0,1)")

    keep_indices, pruned_indices, prune_masks, n_pruned = [], [], [], []
    for b in range(L):
        n_channels = F
        n_prune = int(n_to_prune_per_block[b]) if n_to_prune_per_block is not None else int(n_channels * sparsity)
        if n_channels - n_prune < min_remaining:
            n_prune = max(0, n_channels - min_remaining)
        if verbose:
            print(f"[S1-LOG] block={b}, inter={n_channels}, n_prune={n_prune}, strategy=act_l2")
        if n_prune <= 0:
            keep = np.arange(n_channels)
        else:
            # descending argsort, keep top (n - n_prune), then ascending order
            order = np.argsort(-importance[b], kind="stable")
            keep = np.sort(order[: n_channels - n_prune])
        mask = np.ones((n_channels,), np.int16)
        mask[keep] = 0
        keep_indices.append(keep)
        pruned_indices.append(np.nonzero(mask == 1)[0].tolist())
        prune_masks.append(mask.tolist())
        n_pruned.append(int(n_prune) if n_prune > 0 else 0)
    return WidthPruneResult(keep_indices, pruned_indices, prune_masks, n_pruned)


def build_neuron_mask(result: WidthPruneResult, num_layers: int, d_int: int) -> jnp.ndarray:
    """[num_layers, d_int] float 1.0-keep mask for the search-phase forward."""
    m = np.zeros((num_layers, d_int), np.float32)
    for b, keep in enumerate(result.keep_indices):
        m[b, keep] = 1.0
    return jnp.asarray(m)


def materialize_width_pruning(
    params: Params,
    cfg: ViTConfig,
    keep_indices: Sequence[np.ndarray],
) -> Tuple[Params, ViTConfig]:
    """Gather kept fc1 rows / fc2 cols into new stacked arrays, ON DEVICE.

    Blocks with fewer kept neurons are zero-padded to the per-run maximum so
    the stacked layout (and the scan/unrolled forwards) keep static shapes.
    Zero fc1 rows + zero bias give GELU(0)=0 activations, and the matching
    zero fc2 columns contribute nothing — padding is mathematically inert.
    Logical widths live in ``cfg.block_intermediate_sizes``.

    The gathers run as jitted ``take_along_axis`` on the weights' own device:
    only the tiny [L, fmax] index/mask arrays cross host->device. Host-side
    slicing would round-trip the full weight pytree through the host, which
    dominates pruning wall-clock on relay-attached TPUs (measured 32.7 s for
    ViT-B vs 0.5 s of actual search, docs/tpu_notes.md).
    """
    L = cfg.num_layers
    if len(keep_indices) != L:
        raise ValueError("keep_indices length must match number of blocks")
    logical = tuple(int(len(k)) for k in keep_indices)
    fmax = max(logical)

    idx = np.zeros((L, fmax), np.int32)
    mask = np.zeros((L, fmax), np.float32)
    for b, keep in enumerate(keep_indices):
        k = len(keep)
        idx[b, :k] = np.asarray(keep)
        mask[b, :k] = 1.0

    blocks = params["blocks"]

    @jax.jit
    def gather(fc1_k, fc1_b, fc2_k, idx, mask):
        new_fc1_k = jnp.take_along_axis(fc1_k, idx[:, None, :], axis=2)
        new_fc1_k = new_fc1_k * mask[:, None, :].astype(fc1_k.dtype)
        new_fc1_b = None
        if fc1_b is not None:
            new_fc1_b = jnp.take_along_axis(fc1_b, idx, axis=1) * mask.astype(fc1_b.dtype)
        new_fc2_k = jnp.take_along_axis(fc2_k, idx[:, :, None], axis=1)
        new_fc2_k = new_fc2_k * mask[:, :, None].astype(fc2_k.dtype)
        return new_fc1_k, new_fc1_b, new_fc2_k

    new_fc1_k, new_fc1_b, new_fc2_k = gather(
        blocks["fc1_kernel"], blocks.get("fc1_bias"), blocks["fc2_kernel"],
        jnp.asarray(idx), jnp.asarray(mask))

    new_blocks = dict(blocks)
    new_blocks["fc1_kernel"] = new_fc1_k
    if new_fc1_b is not None:
        new_blocks["fc1_bias"] = new_fc1_b
    new_blocks["fc2_kernel"] = new_fc2_k

    new_params = dict(params)
    new_params["blocks"] = new_blocks
    new_cfg = dataclasses.replace(cfg, block_intermediate_sizes=logical)
    return new_params, new_cfg
