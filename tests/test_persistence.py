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


def test_bf16_llm_npz_roundtrip(tmp_path):
    """np.savez stores bf16 leaves with a raw '|V2' descr (ml_dtypes
    extension types lose their tag); the loader must restore bfloat16 by
    view so trained bf16 checkpoints (cli.train_llm --save-model) load."""
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model, save_llm_model
    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params

    cfg = LlamaConfig(vocab_size=64, hidden_size=16, num_layers=2,
                      num_heads=2, num_kv_heads=2, intermediate_size=32)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     init_llama_params(jax.random.PRNGKey(0), cfg))
    save_llm_model(str(tmp_path / "m"), p, cfg)
    p2, c2 = load_llm_model(str(tmp_path / "m"), dtype=jnp.bfloat16)
    assert c2 == cfg
    for k, v in p["blocks"].items():
        assert p2["blocks"][k].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(v.astype(jnp.float32)),
            np.asarray(p2["blocks"][k].astype(jnp.float32)))
