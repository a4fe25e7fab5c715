from ssp_x_vit_tpu.models.vit import (
    ViTConfig,
    init_vit_params,
    vit_forward,
    vit_forward_materialized,
)

__all__ = [
    "ViTConfig",
    "init_vit_params",
    "vit_forward",
    "vit_forward_materialized",
]
