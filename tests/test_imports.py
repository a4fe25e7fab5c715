"""Import/packaging sanity (reference test_imports.py pattern): every public
module imports and every __all__ name resolves."""

import importlib

import pytest

MODULES = [
    "ssp_x_vit_tpu",
    "ssp_x_vit_tpu.models", "ssp_x_vit_tpu.models.vit",
    "ssp_x_vit_tpu.models.checkpoints", "ssp_x_vit_tpu.models.adapter",
    "ssp_x_vit_tpu.models.persistence",
    "ssp_x_vit_tpu.ops", "ssp_x_vit_tpu.ops.attention", "ssp_x_vit_tpu.ops.ffn",
    "ssp_x_vit_tpu.ops.dispatch", "ssp_x_vit_tpu.ops.common",
    "ssp_x_vit_tpu.ops.pallas.flash_attention", "ssp_x_vit_tpu.ops.pallas.fused_ffn",
    "ssp_x_vit_tpu.pruning", "ssp_x_vit_tpu.pruning.planner",
    "ssp_x_vit_tpu.pruning.width", "ssp_x_vit_tpu.pruning.depth",
    "ssp_x_vit_tpu.pruning.two_ssp", "ssp_x_vit_tpu.pruning.interface",
    "ssp_x_vit_tpu.pruning.finetune", "ssp_x_vit_tpu.pruning.accounting",
    "ssp_x_vit_tpu.masks", "ssp_x_vit_tpu.masks.codec", "ssp_x_vit_tpu.masks.normalize",
    "ssp_x_vit_tpu.masks.summation", "ssp_x_vit_tpu.masks.consensus",
    "ssp_x_vit_tpu.masks.conjunction", "ssp_x_vit_tpu.masks.export",
    "ssp_x_vit_tpu.data", "ssp_x_vit_tpu.data.pipeline", "ssp_x_vit_tpu.data.srp",
    "ssp_x_vit_tpu.data.native_loader",
    "ssp_x_vit_tpu.evaluation", "ssp_x_vit_tpu.evaluation.classify",
    "ssp_x_vit_tpu.evaluation.latency", "ssp_x_vit_tpu.evaluation.report",
    "ssp_x_vit_tpu.parallel", "ssp_x_vit_tpu.parallel.mesh",
    "ssp_x_vit_tpu.parallel.llm_sharding", "ssp_x_vit_tpu.parallel.vit_sharding",
    "ssp_x_vit_tpu.llm.model", "ssp_x_vit_tpu.llm.pruning",
    "ssp_x_vit_tpu.llm.evaluation", "ssp_x_vit_tpu.llm.evopress",
    "ssp_x_vit_tpu.llm.slicegpt", "ssp_x_vit_tpu.llm.ablations",
    "ssp_x_vit_tpu.llm.checkpoints", "ssp_x_vit_tpu.llm.datasets",
    "ssp_x_vit_tpu.llm.generate", "ssp_x_vit_tpu.llm.zeroshot",
    "ssp_x_vit_tpu.llm.downstream",
    "ssp_x_vit_tpu.utils", "ssp_x_vit_tpu.utils.seeding",
    "ssp_x_vit_tpu.utils.logging", "ssp_x_vit_tpu.utils.profiling",
    "ssp_x_vit_tpu.utils.checkpointing",
    "ssp_x_vit_tpu.cli.common", "ssp_x_vit_tpu.cli.auto_2ssp",
    "ssp_x_vit_tpu.cli.apply_mask_prune", "ssp_x_vit_tpu.cli.grid",
    "ssp_x_vit_tpu.cli.normalize_scores",
    "ssp_x_vit_tpu.cli.aggregate_and_mask_summation",
    "ssp_x_vit_tpu.cli.consensus_mask",
]


@pytest.mark.parametrize("name", MODULES)
def test_module_imports(name):
    mod = importlib.import_module(name)
    for attr in getattr(mod, "__all__", []):
        assert hasattr(mod, attr), f"{name}.__all__ lists missing {attr}"
