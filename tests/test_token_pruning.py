"""Token pruning (EViT-style CLS-attention filtering, models/token_pruning.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.models.token_pruning import (
    cls_attention_scores, prune_tokens, vit_forward_token_pruned,
)
from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

CFG = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=6,
                num_heads=4, intermediate_size=256, num_classes=10)


def _setup(seed=0):
    params = init_vit_params(jax.random.PRNGKey(seed), CFG)
    pixels = jax.random.normal(jax.random.PRNGKey(seed + 1),
                               (4, 32, 32, 3), jnp.float32)
    return params, pixels


def test_empty_schedule_matches_vit_forward():
    params, pixels = _setup()
    ref, _ = vit_forward(params, pixels, CFG)
    out = vit_forward_token_pruned(params, pixels, CFG, ())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_scores_are_attention_rows():
    """Scores are a mean of softmaxes: positive, summing to 1 per sample."""
    params, pixels = _setup(2)
    from ssp_x_vit_tpu.models.vit import embed

    x = embed(params, CFG, pixels, jnp.float32)
    bp = {k: v[0] for k, v in params["blocks"].items()}
    s = cls_attention_scores(x, bp, CFG)
    assert s.shape == (4, CFG.seq_len)
    np.testing.assert_allclose(np.asarray(jnp.sum(s, axis=1)), 1.0, rtol=1e-5)
    assert bool(jnp.all(s >= 0))


def test_prune_tokens_keeps_cls_and_top():
    """CLS stays at slot 0; kept tokens are the top-scoring patches; the
    fusion token is a convex combination of the pruned ones."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 9, 8)), jnp.float32)
    scores = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, 9)), jnp.float32)
    out = prune_tokens(x, scores, keep=5)
    assert out.shape == (2, 5, 8)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    top = np.argsort(-np.asarray(scores[:, 1:]), axis=1)[:, :3]
    for b in range(2):
        got = {tuple(np.round(np.asarray(out[b, j]), 5)) for j in range(1, 4)}
        want = {tuple(np.round(np.asarray(x[b, 1 + t]), 5)) for t in top[b]}
        assert got == want


def test_pruned_forward_runs_and_drops_cost():
    params, pixels = _setup(4)
    out = vit_forward_token_pruned(params, pixels, CFG,
                                   [(2, 12), (4, 8)])
    assert out.shape == (4, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
    # the schedule is honored: pruning to more tokens than present raises
    with pytest.raises(ValueError, match="keep"):
        vit_forward_token_pruned(params, pixels, CFG, [(2, 12), (4, 12)])


def test_composes_with_width_materialized():
    """Token pruning runs on a 2SSP width-materialized pytree (same
    _block_apply block contract)."""
    from ssp_x_vit_tpu.pruning.width import materialize_width_pruning

    params, pixels = _setup(5)
    keeps = [np.arange(128) for _ in range(CFG.num_layers)]
    mp, mcfg = materialize_width_pruning(params, CFG, keeps)
    out = vit_forward_token_pruned(mp, pixels, mcfg, [(3, 10)])
    assert out.shape == (4, 10) and bool(jnp.all(jnp.isfinite(out)))


def test_composes_with_int8_quantized():
    """Scoring dequantizes the q/k halves of the int8 pytree; the blocks
    themselves keep their epilogue-scale int8 matmuls."""
    from ssp_x_vit_tpu.models.quant import quantize_vit_params_int8

    params, pixels = _setup(6)
    qp = quantize_vit_params_int8(params, CFG)
    out = vit_forward_token_pruned(qp, pixels, CFG, [(2, 12)])
    ref = vit_forward_token_pruned(params, pixels, CFG, [(2, 12)])
    assert out.shape == (4, 10) and bool(jnp.all(jnp.isfinite(out)))
    # int8 error is bounded, and the KEPT token selection should agree on
    # well-separated scores most of the time; just bound the logit error
    assert float(jnp.max(jnp.abs(out - ref))) < 0.5


def test_duplicate_schedule_rejected():
    params, pixels = _setup(7)
    with pytest.raises(ValueError, match="duplicate"):
        vit_forward_token_pruned(params, pixels, CFG, [(2, 12), (2, 10)])


def test_evaluate_top1_with_schedule():
    """evaluate_top1 accepts a token-pruning schedule; empty schedule takes
    the standard path and both return a valid accuracy."""
    from ssp_x_vit_tpu.data import DataPipeline, synthetic_dataset
    from ssp_x_vit_tpu.evaluation.classify import evaluate_top1

    params, _ = _setup(8)
    imgs, labels = synthetic_dataset(32, 10, image_size=32, seed=2)
    batches = list(DataPipeline(imgs, labels, img_size=32,
                                batch_size=16).batches())
    acc = evaluate_top1(params, CFG, batches)
    acc_tp = evaluate_top1(params, CFG, batches,
                           token_keep_schedule=((2, 12), (4, 8)))
    assert 0.0 <= acc <= 1.0 and 0.0 <= acc_tp <= 1.0
