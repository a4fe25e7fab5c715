"""Weight-only int8 ViT (models/quant.py + mm_quant dispatch in vit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.models.quant import quantize_vit_params_int8
from ssp_x_vit_tpu.models.vit import (
    ViTConfig, init_vit_params, vit_forward, vit_forward_materialized,
)

CFG = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=3,
                num_heads=4, intermediate_size=128, num_classes=10)


@pytest.fixture(scope="module")
def vit():
    return init_vit_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32), CFG


def _dequantized(qp):
    """Host-dequantize every <k>_q/<k>_scale pair back to plain kernels."""
    from ssp_x_vit_tpu.llm.quant import dequantize_weight

    def walk(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k.endswith("_q"):
                out[k[:-2]] = dequantize_weight(v, d[k[:-2] + "_scale"],
                                                jnp.float32)
            elif k.endswith("_scale") and k[:-6] + "_q" in d:
                continue  # consumed by the _q entry (NOT layernorm scales)
            else:
                out[k] = v
        return out

    return walk(qp)


def test_vit_quantized_forward_matches_dequantized(vit):
    """Epilogue-scale int8 == matmul against host-dequantized weights (the
    per-out-channel scale commutes with the contraction)."""
    params, cfg = vit
    qp = quantize_vit_params_int8(params, cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)

    ql, _ = vit_forward(qp, pixels, cfg, compute_dtype=jnp.float32)
    dl, _ = vit_forward(_dequantized(qp), pixels, cfg, compute_dtype=jnp.float32,
                        allow_fused_attn=False)
    np.testing.assert_allclose(np.asarray(ql), np.asarray(dl),
                               rtol=2e-4, atol=2e-4)


def test_vit_quantized_logits_close_to_dense(vit):
    params, cfg = vit
    qp = quantize_vit_params_int8(params, cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3), jnp.float32)
    dense, _ = vit_forward(params, pixels, cfg, compute_dtype=jnp.float32)
    ql, _ = vit_forward(qp, pixels, cfg, compute_dtype=jnp.float32)
    d, q = np.asarray(dense), np.asarray(ql)
    rel = np.linalg.norm(q - d) / np.linalg.norm(d)
    assert rel < 0.1, rel


def test_vit_quantized_materialized_pruned(vit):
    """2SSP-materialized (width+depth) then int8-quantized: the two
    compressions stack; unrolled path maps q-suffixed names."""
    params, cfg = vit
    from ssp_x_vit_tpu.pruning import (
        materialize_width_pruning, materialize_depth_pruning,
    )

    keep = [np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:64]) for i in range(cfg.num_layers)]
    p2, c2 = materialize_width_pruning(params, cfg, keep)
    p2, c2 = materialize_depth_pruning(p2, c2, [1])
    qp = quantize_vit_params_int8(p2, c2)

    pixels = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3), jnp.float32)
    ref = vit_forward_materialized(p2, pixels, c2, compute_dtype=jnp.float32)
    out = vit_forward_materialized(qp, pixels, c2, compute_dtype=jnp.float32)
    d, q = np.asarray(ref), np.asarray(out)
    rel = np.linalg.norm(q - d) / np.linalg.norm(d)
    assert rel < 0.1, rel


def test_vit_quantized_top1_eval(vit):
    from ssp_x_vit_tpu.data import DataPipeline, synthetic_dataset
    from ssp_x_vit_tpu.evaluation import evaluate_top1

    params, cfg = vit
    qp = quantize_vit_params_int8(params, cfg)
    imgs, labels = synthetic_dataset(64, 10, image_size=32, seed=1)
    batches = DataPipeline(imgs, labels, img_size=32, batch_size=32).batches()
    dense = evaluate_top1(params, cfg, batches)
    quant = evaluate_top1(qp, cfg, batches)
    assert abs(dense - quant) < 0.25  # random weights: both near chance


def test_w8a8_mode(vit):
    """Opt-in W8A8: same int8 pytree, activations quantized per-token, the
    dot runs int8 x int8 -> int32 on the MXU. Logits stay close to dense."""
    from ssp_x_vit_tpu.ops import dispatch

    params, cfg = vit
    qp = quantize_vit_params_int8(params, cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3), jnp.float32)
    dense, _ = vit_forward(params, pixels, cfg, compute_dtype=jnp.float32)
    dispatch.set_w8a8_enabled(True)
    try:
        wl, _ = vit_forward(qp, pixels, cfg, compute_dtype=jnp.float32)
    finally:
        dispatch.set_w8a8_enabled(None)
    d, w = np.asarray(dense), np.asarray(wl)
    rel = np.linalg.norm(w - d) / np.linalg.norm(d)
    assert rel < 0.15, rel


def test_w8a8_matmul_reference():
    from ssp_x_vit_tpu.llm.quant import quantize_weight_int8
    from ssp_x_vit_tpu.ops.common import w8a8_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
    wq, sw = quantize_weight_int8(w)
    out = w8a8_matmul(x, wq, sw, jnp.float32)

    ax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    sx = np.where(ax > 0, ax / 127.0, 1.0)
    xq = np.clip(np.round(np.asarray(x) / sx), -127, 127)
    ref = (xq @ np.asarray(wq, np.float64)) * sx * np.asarray(sw)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_quantized_model_persistence_roundtrip(vit, tmp_path):
    """save/load of an int8-quantized pruned model preserves int8 codes
    (load casts only float leaves) and reproduces identical logits."""
    from ssp_x_vit_tpu.models.persistence import (
        load_pruned_model, save_pruned_model,
    )

    params, cfg = vit
    qp = quantize_vit_params_int8(params, cfg)
    save_pruned_model(str(tmp_path / "m"), qp, cfg)
    lp, lcfg = load_pruned_model(str(tmp_path / "m"))
    assert lp["blocks"]["qkv_kernel_q"].dtype == jnp.int8
    pixels = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3), jnp.float32)
    a, _ = vit_forward(qp, pixels, cfg, compute_dtype=jnp.float32)
    b, _ = vit_forward(lp, pixels, lcfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
