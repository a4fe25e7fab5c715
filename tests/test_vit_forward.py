"""ViT forward-pass semantics: shapes, gating, scan/unrolled equivalence.

Mirrors reference test_stage2_attention_only.py's tiny-config strategy
(SURVEY.md §4) with JAX-specific invariants added.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.models.vit import (
    ViTConfig,
    init_vit_params,
    vit_forward,
    vit_forward_materialized,
)


def _pixels(cfg, batch=2, seed=0):
    return jax.random.normal(
        jax.random.PRNGKey(seed), (batch, cfg.image_size, cfg.image_size, cfg.num_channels)
    )


def test_logits_shape(tiny_cfg, tiny_params):
    logits, aux = vit_forward(tiny_params, _pixels(tiny_cfg), tiny_cfg)
    assert logits.shape == (2, tiny_cfg.num_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_all_ones_gates_match_dense(tiny_cfg, tiny_params):
    px = _pixels(tiny_cfg)
    dense, _ = vit_forward(tiny_params, px, tiny_cfg)
    gated, _ = vit_forward(
        tiny_params, px, tiny_cfg,
        attn_gate=jnp.ones((tiny_cfg.num_layers,)),
        mlp_gate=jnp.ones((tiny_cfg.num_layers,)),
        neuron_mask=jnp.ones((tiny_cfg.num_layers, tiny_cfg.intermediate_size)),
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gated), rtol=1e-6, atol=1e-6)


def test_attn_gate_changes_output(tiny_cfg, tiny_params):
    px = _pixels(tiny_cfg)
    dense, _ = vit_forward(tiny_params, px, tiny_cfg)
    gate = jnp.ones((tiny_cfg.num_layers,)).at[1].set(0.0)
    skipped, _ = vit_forward(tiny_params, px, tiny_cfg, attn_gate=gate)
    assert not np.allclose(np.asarray(dense), np.asarray(skipped))


def test_gate_matches_materialized_depth_prune(tiny_cfg, tiny_params):
    """Skip-gate semantics == physically removing the attention."""
    from ssp_x_vit_tpu.pruning.depth import materialize_depth_pruning

    px = _pixels(tiny_cfg)
    gate = jnp.ones((tiny_cfg.num_layers,)).at[1].set(0.0).at[2].set(0.0)
    gated, _ = vit_forward(tiny_params, px, tiny_cfg, attn_gate=gate)

    mat_params, mat_cfg = materialize_depth_pruning(tiny_params, tiny_cfg, [1, 2])
    mat = vit_forward_materialized(mat_params, px, mat_cfg)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(mat), rtol=1e-5, atol=1e-5)


def test_materialized_dense_matches_scan(tiny_cfg, tiny_params):
    px = _pixels(tiny_cfg)
    dense, _ = vit_forward(tiny_params, px, tiny_cfg)
    mat = vit_forward_materialized(tiny_params, px, tiny_cfg)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(mat), rtol=1e-5, atol=1e-5)


def test_ffn_stats_shape_and_value(tiny_cfg, tiny_params):
    px = _pixels(tiny_cfg, batch=3)
    _, aux = vit_forward(tiny_params, px, tiny_cfg, collect_ffn_stats=True)
    stats = aux["ffn_stats"]
    assert stats.shape == (tiny_cfg.num_layers, 3, tiny_cfg.intermediate_size)
    assert (np.asarray(stats) >= 0).all()


def test_block_outputs(tiny_cfg, tiny_params):
    px = _pixels(tiny_cfg)
    _, aux = vit_forward(tiny_params, px, tiny_cfg, return_block_outputs=True)
    assert aux["block_outputs"].shape == (
        tiny_cfg.num_layers, 2, tiny_cfg.seq_len, tiny_cfg.hidden_size,
    )


def test_no_retrace_across_gates(tiny_cfg, tiny_params):
    """Changing the gate VALUES must not retrace/recompile the forward."""
    px = _pixels(tiny_cfg)
    traces = 0

    @jax.jit
    def fwd(params, px, gate):
        nonlocal traces
        traces += 1
        return vit_forward(params, px, tiny_cfg, attn_gate=gate)[0]

    for i in range(tiny_cfg.num_layers):
        gate = jnp.ones((tiny_cfg.num_layers,)).at[i].set(0.0)
        fwd(tiny_params, px, gate)
    assert traces == 1


def test_adapter_head():
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128, num_classes=10,
                    head_type="adapter", adapter_bottleneck=16)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    logits, _ = vit_forward(params, _pixels(cfg), cfg)
    assert logits.shape == (2, 10)
