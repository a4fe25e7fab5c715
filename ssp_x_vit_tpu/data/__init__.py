from ssp_x_vit_tpu.data.pipeline import (
    DataPipeline,
    load_cifar,
    synthetic_dataset,
)

__all__ = ["DataPipeline", "load_cifar", "synthetic_dataset"]
