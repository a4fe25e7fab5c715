"""Multi-LoRA serving: one batched decode over per-request adapters.

Production fleets serve MANY finetunes of one base model (per-tenant or
per-task LoRA). Loading a merged checkpoint per adapter wastes HBM and
kills batching; this module serves a BANK of adapters in one program
(the punica/S-LoRA design, TPU-native):

- Adapters stack into bank arrays ``[L, R, d, r]`` / ``[L, R, r, n]``
  (layer-major so they ride the same ``lax.scan`` as the base blocks;
  R = number of adapters). The ``alpha/r`` scale is folded into the B
  matrices at build time.
- ``attach_lora_bank`` places them in ``params["blocks"]`` under
  ``<target>_lora_a/_lora_b`` keys — the serving scan slices them per
  layer exactly like base kernels, with no new threading through the
  cache machinery.
- Each request carries an adapter id; the decode gathers its rank-r pair
  per batch row and adds ``(x @ A[id]) @ B[id]`` to the target projection
  (two [b, 1, ·] einsums per target — negligible next to the base matmul).
  Slot 0 is reserved as the IDENTITY adapter (zeros), so id 0 serves the
  base model in the same batch.

Composes with the quantized base (the bank stays float; the base rides
``_mm`` dispatch), packed qkv/gateup serving params (deltas are computed
per target and added after the packed split), GQA, pruned and
sliding-window models. Exact: each row's generation equals serving
``merge_lora(base, adapter_i)`` alone.

The reference has no serving machinery (src/evaluation.py:149-184); this
extends the rebuild's beyond-reference serving subsystem.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ssp_x_vit_tpu.llm.model import Params

LORA_SUFFIX_A = "_lora_a"
LORA_SUFFIX_B = "_lora_b"

# Targets the serving decode actually applies deltas for (_block_qkv +
# _proj_o). MLP targets would attach cleanly but be SILENTLY ignored, so
# build_lora_bank refuses them.
SERVABLE_TARGETS = ("q_kernel", "k_kernel", "v_kernel", "o_kernel")


def build_lora_bank(adapters: Sequence[Params], *, alpha: float = 16.0,
                    dtype=jnp.float32) -> Params:
    """Stack ``llm.lora`` adapter pytrees ({target: {"a": [L, d, r],
    "b": [L, r, n]}}) into serving bank arrays. Returns {"<t>_lora_a":
    [L, R+1, d, r], "<t>_lora_b": [L, R+1, r, n]} with slot 0 = identity
    (zeros) and the alpha/r scale folded into b."""
    if not adapters:
        raise ValueError("need at least one adapter")
    targets = sorted(adapters[0])
    unsupported = [t for t in targets if t not in SERVABLE_TARGETS]
    if unsupported:
        raise ValueError(
            f"multi-LoRA serving applies deltas on {SERVABLE_TARGETS} only; "
            f"adapter targets {unsupported} would be silently ignored "
            "(merge_lora those adapters instead)")
    bank: Params = {}
    for t in targets:
        a_list, b_list = [], []
        for ad in adapters:
            if set(ad) != set(targets):
                raise ValueError("adapters target different key sets")
            r = ad[t]["a"].shape[-1]
            a_list.append(ad[t]["a"].astype(dtype))
            b_list.append((ad[t]["b"].astype(jnp.float32) * (alpha / r))
                          .astype(dtype))
        a = jnp.stack(a_list, axis=1)                       # [L, R, d, r]
        b = jnp.stack(b_list, axis=1)                       # [L, R, r, n]
        ident_a = jnp.zeros(a[:, :1].shape, dtype)
        ident_b = jnp.zeros(b[:, :1].shape, dtype)
        bank[t + LORA_SUFFIX_A] = jnp.concatenate([ident_a, a], axis=1)
        bank[t + LORA_SUFFIX_B] = jnp.concatenate([ident_b, b], axis=1)
    return bank


def attach_lora_bank(params: Params, bank: Params) -> Params:
    """Place bank arrays in params["blocks"] (shared by reference, no copy)
    so the serving layer scan slices them per layer alongside base kernels.
    Adapter ids then select rows at decode: slot 0 = base model, slot i =
    ``adapters[i-1]`` from build_lora_bank."""
    blocks = dict(params["blocks"])
    for k, v in bank.items():
        base = k[: -len(LORA_SUFFIX_A)]
        if base not in blocks and not any(
                b.startswith(base) for b in blocks):
            raise ValueError(f"bank target {base} not in params blocks")
        blocks[k] = v
    out = {k: v for k, v in params.items() if k != "blocks"}
    out["blocks"] = blocks
    return out


def lora_delta(x, bp, target: str, lora_ids, compute_dtype):
    """Per-row adapter delta for one projection: (x @ A[id]) @ B[id].
    x [b, s, d]; bank slices in bp: a [R, d, r], b [R, r, n]; lora_ids [b].
    Returns [b, s, n] or None when the target has no bank / ids is None."""
    a = bp.get(target + LORA_SUFFIX_A)
    b = bp.get(target + LORA_SUFFIX_B)
    if a is None or b is None or lora_ids is None:
        return None
    xa = jnp.einsum("bsd,bdr->bsr", x, a[lora_ids].astype(compute_dtype))
    return jnp.einsum("bsr,brn->bsn", xa, b[lora_ids].astype(compute_dtype))
