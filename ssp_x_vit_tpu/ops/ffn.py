"""ViT FFN (fc1 -> GELU -> fc2) with an optional per-neuron importance side-output.

The side-output replaces the reference's hook-accumulate pattern
(src/vit_pruning.py:112-201): the same pass that computes the FFN output also
emits, per sample, the sum over tokens of the squared intermediate activation.
The caller takes sqrt (L2 over tokens) and averages over samples to obtain the
2SSP stage-1 importance — identical math, no second pass, no hooks.

A fused Pallas kernel (ops/pallas/fused_ffn.py) implements the same contract on
TPU; this jnp version is the portable reference and the autodiff path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.ops.common import gelu


def ffn_forward(
    x: jax.Array,
    fc1_kernel: jax.Array,
    fc1_bias: Optional[jax.Array],
    fc2_kernel: jax.Array,
    fc2_bias: Optional[jax.Array],
    *,
    neuron_mask: Optional[jax.Array] = None,
    collect_stats: bool = False,
    use_pallas_kernel: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """FFN forward with optional neuron masking and importance statistics.

    Args:
        x: [batch, seq, hidden]
        fc1_kernel: [hidden, d_int]
        fc1_bias: [d_int] or None
        fc2_kernel: [d_int, hidden]
        fc2_bias: [hidden] or None
        neuron_mask: optional [d_int] float mask (1.0 = keep, 0.0 = pruned)
            applied to the intermediate activation — the recompile-free
            equivalent of materially slicing fc1 rows / fc2 cols during search.
        collect_stats: if True, also return per-sample sum over tokens of the
            squared (pre-mask) intermediate activation, shape [batch, d_int],
            in fp32.

    Returns:
        (output [batch, seq, hidden], stats [batch, d_int] or None)
    """
    if use_pallas_kernel is None:
        from ssp_x_vit_tpu.ops.dispatch import use_pallas

        # Measured crossover (docs/tpu_notes.md): the tuned kernel wins for
        # f >= 2048 (dense ViT widths, stats free); below that XLA's epilogue
        # fusion with the surrounding residual/layernorm ops wins (e.g.
        # 50%-pruned f=1622: 4.6ms XLA vs 5.3ms pallas).
        use_pallas_kernel = use_pallas() and x.shape[1] >= 64 and fc1_kernel.shape[1] >= 2048
    if use_pallas_kernel:
        from ssp_x_vit_tpu.ops.pallas.fused_ffn import fused_ffn

        return fused_ffn(
            x, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
            neuron_mask=neuron_mask, collect_stats=collect_stats,
        )

    h = jnp.einsum("bsd,df->bsf", x, fc1_kernel.astype(x.dtype))
    if fc1_bias is not None:
        h = h + fc1_bias.astype(x.dtype)
    h = gelu(h)

    stats = None
    if collect_stats:
        # Importance is measured on the activation the reference hooks observe:
        # the output of the intermediate (fc1+GELU) module, before any mask.
        stats = jnp.sum(jnp.square(h.astype(jnp.float32)), axis=1)

    if neuron_mask is not None:
        h = h * neuron_mask.astype(h.dtype)

    out = jnp.einsum("bsf,fd->bsd", h, fc2_kernel.astype(x.dtype))
    if fc2_bias is not None:
        out = out + fc2_bias.astype(x.dtype)
    return out, stats
