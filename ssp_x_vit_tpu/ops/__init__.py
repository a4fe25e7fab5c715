"""TPU compute layer: jnp reference ops and Pallas kernels.

All hot-path ops have two implementations with identical numerics contracts:

- a plain ``jnp`` reference (runs anywhere, used for tests / CPU / interpret mode)
- a Pallas TPU kernel (used on TPU for the hot paths)

Dispatch is centralized in :func:`ssp_x_vit_tpu.ops.dispatch.use_pallas`.
"""

from ssp_x_vit_tpu.ops.common import gelu, layer_norm, patchify
from ssp_x_vit_tpu.ops.attention import multi_head_attention
from ssp_x_vit_tpu.ops.ffn import ffn_forward

__all__ = [
    "gelu",
    "layer_norm",
    "patchify",
    "multi_head_attention",
    "ffn_forward",
]
