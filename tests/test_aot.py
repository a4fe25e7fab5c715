"""AOT serving artifacts (llm/aot.py): jax.export round-trips, artifact-driven
generation equals the live serving path, cross-platform TPU lowering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.aot import (
    export_decode_step, export_serving_bundle, load_artifact, load_bundle,
    save_bundle,
)
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.serve import generate_kv_scan, init_cache

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


@pytest.fixture(scope="module")
def model():
    return init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32), CFG


def _drive_artifacts(bundle, params, cfg, prompt, steps, p_pad, max_len,
                     cache_dtype):
    """Greedy generation through deserialized artifacts only."""
    pre = bundle[f"prefill_{p_pad}"]
    dec = bundle["decode"]
    ck, cv = init_cache(cfg, 1, max_len, cache_dtype)
    toks = np.zeros((1, p_pad), np.int32)
    toks[0, p_pad - len(prompt):] = prompt
    pads = np.asarray([p_pad - len(prompt)], np.int32)
    logits, ck, cv = pre.call(params, jnp.asarray(toks), ck, cv,
                              jnp.asarray(pads))
    out = [int(np.argmax(np.asarray(logits)))]
    pos = p_pad
    for _ in range(steps - 1):
        logits, ck, cv = dec.call(params, jnp.asarray(out[-1:], np.int32), ck,
                                  cv, jnp.asarray(pos, jnp.int32),
                                  jnp.asarray(pads))
        out.append(int(np.argmax(np.asarray(logits))))
        pos += 1
    return np.asarray(list(prompt) + out, np.int32)


def test_artifact_generation_matches_live_path(model, tmp_path):
    """Serialize -> save to disk -> load -> drive greedy generation purely
    through the artifacts; must equal generate_kv_scan exactly."""
    params, cfg = model
    prompt = np.asarray([3, 1, 4, 1, 5, 9], np.int32)
    steps, p_pad = 8, 32
    max_len = p_pad + steps
    bundle = export_serving_bundle(params, cfg, batch=1, prompt_buckets=[32],
                                   max_len=max_len, cache_dtype=jnp.float32)
    save_bundle(bundle, str(tmp_path / "art"))
    loaded = load_bundle(str(tmp_path / "art"))
    assert set(loaded) == {"prefill_32", "decode"}

    got = _drive_artifacts(loaded, params, cfg, prompt, steps, p_pad, max_len,
                           jnp.float32)
    ref = generate_kv_scan(params, cfg, prompt, max_length=len(prompt) + steps,
                           cache_dtype=jnp.float32)
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_artifact_int8_cache_pytree_signature(model):
    """Quantized {q,s} cache pytrees export/deserialize/call transparently."""
    params, cfg = model
    blob = export_decode_step(params, cfg, batch=1, max_len=16,
                              cache_dtype=jnp.int8)
    art = load_artifact(blob)
    ck, cv = init_cache(cfg, 1, 16, jnp.int8)
    logits, ck2, cv2 = art.call(params, jnp.asarray([5], jnp.int32), ck, cv,
                                jnp.asarray(0, jnp.int32),
                                jnp.asarray([0], jnp.int32))
    assert logits.shape == (1, cfg.vocab_size)
    assert isinstance(ck2, dict) and ck2["q"].dtype == jnp.int8


def test_cross_platform_tpu_lowering(model):
    """platforms=('tpu',) lowers and serializes WITHOUT a TPU attached —
    build artifacts anywhere, ship to the fleet. (Not executable here.)"""
    params, cfg = model
    blob = export_decode_step(params, cfg, batch=1, max_len=16,
                              cache_dtype=jnp.bfloat16, platforms=("tpu",))
    art = load_artifact(blob)
    assert art.platforms == ("tpu",)


def test_vit_artifact_matches_live(tmp_path):
    """ViT classify artifact (dense + 50%-pruned materialized) == live
    forward; round-trips through disk."""
    from ssp_x_vit_tpu.llm.aot import export_vit_classify, load_artifact
    from ssp_x_vit_tpu.models.vit import (
        ViTConfig, init_vit_params, vit_forward,
    )
    from ssp_x_vit_tpu.pruning import (
        materialize_width_pruning, select_keep_indices, weight_l1_importance,
    )

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128, num_classes=10)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3),
                               jnp.float32)
    blob = export_vit_classify(params, cfg, batch=2,
                               compute_dtype=jnp.float32)
    (tmp_path / "vit.stablehlo").write_bytes(blob)
    art = load_artifact((tmp_path / "vit.stablehlo").read_bytes())
    got = art.call(params, pixels)
    ref, _ = vit_forward(params, pixels, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # width-materialized pruned pytree exports too
    width = select_keep_indices(
        weight_l1_importance(params),
        n_to_prune_per_block=[64] * cfg.num_layers,
        min_remaining=32, verbose=False)
    p2, c2 = materialize_width_pruning(params, cfg, width.keep_indices)
    blob2 = export_vit_classify(p2, c2, batch=2, compute_dtype=jnp.float32)
    art2 = load_artifact(blob2)
    from ssp_x_vit_tpu.models.vit import vit_forward as vf
    got2 = art2.call(p2, pixels)
    ref2, _ = vf(p2, pixels, c2, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-6, atol=1e-6)
