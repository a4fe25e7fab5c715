from ssp_x_vit_tpu.parallel.mesh import (
    make_mesh,
    make_hybrid_mesh,
    batch_sharding,
    replicate,
    shard_batch,
)
from ssp_x_vit_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipeline_forward,
    make_pipeline_train_step,
    shard_llama_params_pipeline,
)
from ssp_x_vit_tpu.parallel.ring_attention import (
    ring_attention,
    make_seq_parallel_nll,
    evaluate_perplexity_seq_parallel,
)
from ssp_x_vit_tpu.parallel.moe import (
    MoEConfig,
    init_moe_params,
    moe_ffn,
    shard_moe_params,
)

__all__ = [
    "make_mesh", "make_hybrid_mesh", "batch_sharding", "replicate",
    "shard_batch",
    "make_pipeline_mesh", "make_pipeline_forward", "make_pipeline_train_step",
    "shard_llama_params_pipeline",
    "ring_attention", "make_seq_parallel_nll", "evaluate_perplexity_seq_parallel",
    "MoEConfig", "init_moe_params", "moe_ffn", "shard_moe_params",
]
