"""Semantic-parity regression against the actual reference implementation
(skipped when the read-only reference mount is absent)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")


def test_mask_conjunction_sweep_matches_reference_exactly():
    """Deterministic (random=False) conjunction sweep: all five output series
    (targets, internal att/fc sparsities, effective att/fc sparsities) must
    match the reference's torch implementation bit-for-bit."""
    sys.path.insert(0, os.path.join(REF, "pruning_srp-main"))
    import mask_conjunction as ref

    r = ref.test_unstr_mask_conj(
        64, 16, 4, 10,
        [[ref.DepthPruning, True, True], [ref.WidthPruning, True, True]], False)
    ref_series = [list(map(float, s)) for s in r]

    from ssp_x_vit_tpu.masks.conjunction import (
        ModelDims, mask_conjunction, DepthPruning, WidthPruning,
    )

    targets, ats, fcs, at_ef, fc_ef = [0], [0], [0], [0], [0]
    dims = ModelDims(64, 16, 4, n_blocks=12)
    for i in range(10):
        target = (i + 1) / 10
        res = mask_conjunction(
            dims, [[DepthPruning, True, True], [WidthPruning, True, True]],
            target, (ats[-1], fcs[-1]), random=False)
        targets.append(round(target, 5))
        ats.append(round(res[0], 5))
        fcs.append(round(res[1], 5))
        at_ef.append(round(res[2], 5))
        fc_ef.append(round(res[3], 5))

    for ref_s, ours in zip(ref_series, [targets, ats, fcs, at_ef, fc_ef]):
        np.testing.assert_allclose(ours, ref_s, atol=1e-9)


def test_planner_matches_reference_on_tiny_hf_vit():
    """plan_2ssp_allocation must choose the same (K, t) as the reference
    planner on an identical tiny HF ViT across targets."""
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig as HFViTConfig, ViTForImageClassification

    sys.path.insert(0, REF)
    from src.vit_pruning import plan_2ssp_allocation as ref_plan

    from ssp_x_vit_tpu.models.vit import ViTConfig
    from ssp_x_vit_tpu.pruning import plan_2ssp_allocation

    hf_cfg = HFViTConfig(hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                         intermediate_size=128, image_size=32, patch_size=16,
                         num_labels=10)
    with torch.no_grad():
        model = ViTForImageClassification(hf_cfg)
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64, num_layers=4,
                    num_heads=4, intermediate_size=128, num_classes=10)

    for target in (0.1, 0.2, 0.3, 0.4):
        ref_p = ref_plan(model, target, min_remaining=16)
        our_p = plan_2ssp_allocation(cfg, target, min_remaining=16)
        assert our_p.blocks_to_prune == ref_p.blocks_to_prune, target
        assert our_p.per_block_neurons_to_prune == ref_p.per_block_neurons_to_prune, target
        assert our_p.estimated_total_removed_params == ref_p.estimated_total_removed_params, target
