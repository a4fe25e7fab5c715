"""Pruned-model save/load round-trip."""

import jax
import numpy as np

from ssp_x_vit_tpu.models.vit import vit_forward_materialized
from ssp_x_vit_tpu.models.persistence import save_pruned_model, load_pruned_model
from ssp_x_vit_tpu.pruning import (
    weight_l1_importance, select_keep_indices,
    materialize_width_pruning, materialize_depth_pruning,
)


def test_pruned_model_roundtrip(tiny_cfg, tiny_params, tmp_path):
    width = select_keep_indices(weight_l1_importance(tiny_params),
                                n_to_prune_per_block=[16] * tiny_cfg.num_layers,
                                min_remaining=8, verbose=False)
    p1, c1 = materialize_width_pruning(tiny_params, tiny_cfg, width.keep_indices)
    p2, c2 = materialize_depth_pruning(p1, c1, [1, 2])

    out = save_pruned_model(str(tmp_path / "pruned"), p2, c2)
    p3, c3 = load_pruned_model(out)

    assert c3 == c2  # full config round-trip incl. pruning state
    px = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    a = vit_forward_materialized(p2, px, c2)
    b = vit_forward_materialized(p3, px, c3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
