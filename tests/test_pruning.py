"""Pruning library: planner invariants, width/depth selection, interface contract.

Mirrors reference test strategy (test_auto2ssp_interface.py shape contract,
test_stage2_attention_only.py param invariants) on tiny configs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward, vit_forward_materialized
from ssp_x_vit_tpu.pruning import (
    plan_2ssp_allocation,
    count_total_params,
    count_block_params,
    count_attention_params_per_block,
    compute_actual_sparsity,
    select_keep_indices,
    materialize_width_pruning,
    materialize_depth_pruning,
    compute_ffn_activation_importance,
    weight_l1_importance,
)
from ssp_x_vit_tpu.pruning.interface import Auto2SSPInterface, PruningTypes


def test_param_accounting_matches_array_sizes(tiny_cfg, tiny_params):
    total = count_total_params(tiny_cfg)
    actual = sum(int(np.asarray(x).size) for x in jax.tree.leaves(tiny_params))
    assert total == actual


def test_depth_prune_param_accounting(tiny_cfg, tiny_params):
    p0 = count_total_params(tiny_cfg)
    attn_per_block = count_attention_params_per_block(tiny_cfg)[0]
    _, cfg2 = materialize_depth_pruning(tiny_params, tiny_cfg, [1])
    p1 = count_total_params(cfg2)
    assert p0 - p1 == attn_per_block
    assert count_attention_params_per_block(cfg2)[1] == 0


def test_width_prune_param_accounting(tiny_cfg, tiny_params):
    d = tiny_cfg.hidden_size
    imp = weight_l1_importance(tiny_params)
    res = select_keep_indices(imp, n_to_prune_per_block=[10] * tiny_cfg.num_layers,
                              min_remaining=8, verbose=False)
    _, cfg2 = materialize_width_pruning(tiny_params, tiny_cfg, res.keep_indices)
    p0, p1 = count_total_params(tiny_cfg), count_total_params(cfg2)
    assert p0 - p1 == tiny_cfg.num_layers * 10 * (2 * d + 1)


def test_width_materialization_preserves_function(tiny_cfg, tiny_params):
    """Materialized width pruning == masked forward with the same keep set."""
    from ssp_x_vit_tpu.pruning.width import build_neuron_mask

    px = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    imp = weight_l1_importance(tiny_params)
    res = select_keep_indices(imp, n_to_prune_per_block=[32] * tiny_cfg.num_layers,
                              min_remaining=8, verbose=False)
    nmask = build_neuron_mask(res, tiny_cfg.num_layers, tiny_cfg.intermediate_size)
    masked, _ = vit_forward(tiny_params, px, tiny_cfg, neuron_mask=nmask)

    mat_params, mat_cfg = materialize_width_pruning(tiny_params, tiny_cfg, res.keep_indices)
    mat = vit_forward_materialized(mat_params, px, mat_cfg)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(mat), rtol=2e-5, atol=2e-5)


def test_activation_importance_matches_manual_hooks(tiny_cfg, tiny_params, tiny_batches):
    """Fused side-output == manual per-block recompute of L2-over-tokens."""
    imp = compute_ffn_activation_importance(tiny_params, tiny_cfg, tiny_batches[:1])
    assert imp.shape == (tiny_cfg.num_layers, tiny_cfg.intermediate_size)
    assert (imp >= 0).all() and np.isfinite(imp).all()

    # manual recompute for block 0 via the public forward
    batch = tiny_batches[0]
    _, aux = vit_forward(tiny_params, jnp.asarray(batch["pixel_values"]), tiny_cfg,
                         collect_ffn_stats=True)
    stats = np.asarray(aux["ffn_stats"])  # [L, b, F] sumsq over tokens
    manual = np.sqrt(stats[0]).sum(axis=0) / batch["pixel_values"].shape[0]
    np.testing.assert_allclose(imp[0], manual, rtol=1e-5, atol=1e-6)


def test_planner_reaches_target(tiny_cfg):
    for target in (0.1, 0.25, 0.4):
        plan = plan_2ssp_allocation(tiny_cfg, target, min_remaining=16)
        total = count_total_params(tiny_cfg)
        assert abs(plan.estimated_total_removed_params - target * total) / total < 0.05
        assert 0 <= plan.blocks_to_prune <= tiny_cfg.num_layers - 1


def test_planner_forced_blocks(tiny_cfg):
    plan = plan_2ssp_allocation(tiny_cfg, 0.3, min_remaining=16, forced_blocks=2)
    assert plan.blocks_to_prune == 2


def test_interface_contract_shapes(tiny_cfg, tiny_params, tiny_batches):
    """Reference contract (test_auto2ssp_interface.py:53-56): att importance is
    [B]; mlp importance is a per-block list of [d_int] arrays."""
    iface = Auto2SSPInterface(tiny_params, tiny_cfg, tiny_batches[:2], batch_limit=2)
    att, mlp = iface.fit()
    assert iface.att_prune_type == PruningTypes.DEPTH
    assert iface.mlp_prune_type == PruningTypes.WIDTH
    assert np.asarray(att).shape == (tiny_cfg.num_layers,)
    assert isinstance(mlp, list) and len(mlp) == tiny_cfg.num_layers
    for t in mlp:
        assert np.asarray(t).shape == (tiny_cfg.intermediate_size,)


def test_interface_heuristic_mode(tiny_cfg, tiny_params):
    iface = Auto2SSPInterface(tiny_params, tiny_cfg, None, importance_mode="heuristic")
    att, mlp = iface.fit()
    L = tiny_cfg.num_layers
    expected = [(i if i < L / 2 else L - i) for i in range(L)]
    np.testing.assert_allclose(np.asarray(att), expected)


def test_prefetch_matches_sync_iteration(tiny_batches):
    """Background-prefetched pipeline yields identical batches in order,
    and producer exceptions surface at the consumer."""
    import numpy as np
    import pytest
    from ssp_x_vit_tpu.data import DataPipeline, synthetic_dataset
    from ssp_x_vit_tpu.data.pipeline import prefetch

    imgs, labels = synthetic_dataset(40, 4, image_size=32, seed=7)
    pipe = DataPipeline(imgs, labels, img_size=32, batch_size=16)
    sync = pipe.batches()
    pre = list(pipe.iter_prefetch(size=3))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(np.asarray(a["pixel_values"]),
                                      np.asarray(b["pixel_values"]))
        np.testing.assert_array_equal(np.asarray(a["labels"]), np.asarray(b["labels"]))

    def boom():
        yield sync[0]
        raise RuntimeError("producer failed")

    it = prefetch(boom(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)
