"""Ahead-of-time serving artifacts via jax.export (StableHLO).

Production serving should not need the Python model code, tracing, or a jit
warm-up at process start: this module exports the serving-step computations
(prefill + decode step) as serialized StableHLO artifacts that any runtime
with XLA can deserialize and call. Params and caches remain runtime INPUTS
(not constants baked into the graph), so one artifact serves every
checkpoint of its config — quantized pytrees included (the pytree structure
is part of the exported signature).

Cross-platform: ``platforms=("tpu",)`` lowers for TPU on any host (XLA
lowering does not need the device) — build artifacts on CI, ship to the
fleet. The reference has no serving machinery at all (generation recomputes
the full sequence per token, src/evaluation.py:149-184); this extends the
rebuild's beyond-reference serving subsystem with a deployment story.

Notes:
- The exported functions are FUNCTIONAL (cache in, cache out). The live
  Python path donates caches (serve.py `donate_argnums`); XLA input-output
  aliasing for deserialized artifacts is runtime-dependent, so budget two
  cache buffers when calling artifacts directly.
- One artifact per (batch, shape-bucket): static shapes are the TPU serving
  design everywhere in this framework (docs/serving.md design rule 1).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params
from ssp_x_vit_tpu.llm.serve import decode_step, init_cache, prefill


def _abstract(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree)


def _cache_abstract(cfg: LlamaConfig, batch: int, max_len: int, cache_dtype,
                    rolling):
    """Rolling artifacts MUST trace with exactly W cache slots — the rolling
    mask arithmetic (age = (g - slot) mod W) is only correct when the slot
    count equals W (serve.init_rolling_cache)."""
    if rolling is not None:
        max_len = rolling
    ck, cv = init_cache(cfg, batch, max_len, cache_dtype)
    return _abstract(ck), _abstract(cv)


def export_prefill(params: Params, cfg: LlamaConfig, *, batch: int, p_pad: int,
                   max_len: int, cache_dtype=jnp.bfloat16,
                   rolling: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the prefill step for LEFT-padded [batch, p_pad] prompts into
    a [*, max_len, ...] cache. Call signature of the artifact:
    (params, tokens int32 [b, p_pad], cache_k, cache_v, pad_lens int32 [b])
    -> (logits [b, V], cache_k, cache_v)."""
    def fn(p, tokens, ck, cv, pad_lens):
        return prefill(p, tokens, ck, cv, cfg, pad_lens, rolling=rolling)

    ck, cv = _cache_abstract(cfg, batch, max_len, cache_dtype, rolling)
    exported = jexport.export(
        jax.jit(fn), platforms=platforms)(
        _abstract(params),
        jax.ShapeDtypeStruct((batch, p_pad), jnp.int32),
        ck, cv,
        jax.ShapeDtypeStruct((batch,), jnp.int32))
    return exported.serialize()


def export_decode_step(params: Params, cfg: LlamaConfig, *, batch: int,
                       max_len: int, cache_dtype=jnp.bfloat16,
                       rolling: Optional[int] = None,
                       platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize one greedy-serving decode step. Call signature:
    (params, token int32 [b], cache_k, cache_v, pos int32 [], pad_lens [b])
    -> (logits [b, V], cache_k, cache_v)."""
    def fn(p, token, ck, cv, pos, pad_lens):
        return decode_step(p, token, ck, cv, cfg, pos, pad_lens,
                           rolling=rolling)

    ck, cv = _cache_abstract(cfg, batch, max_len, cache_dtype, rolling)
    exported = jexport.export(
        jax.jit(fn), platforms=platforms)(
        _abstract(params),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        ck, cv,
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32))
    return exported.serialize()


def export_serving_bundle(params: Params, cfg: LlamaConfig, *, batch: int,
                          prompt_buckets: Sequence[int], max_len: int,
                          cache_dtype=jnp.bfloat16,
                          rolling: Optional[int] = None,
                          platforms: Optional[Sequence[str]] = None):
    """Artifact set for a serving deployment: one prefill per prompt bucket
    + one decode step. Returns {"prefill_<p_pad>": bytes, "decode": bytes}."""
    bundle = {
        f"prefill_{p}": export_prefill(
            params, cfg, batch=batch, p_pad=p, max_len=max_len,
            cache_dtype=cache_dtype, rolling=rolling, platforms=platforms)
        for p in prompt_buckets}
    bundle["decode"] = export_decode_step(
        params, cfg, batch=batch, max_len=max_len, cache_dtype=cache_dtype,
        rolling=rolling, platforms=platforms)
    return bundle


def export_vit_classify(params, cfg, *, batch: int,
                        compute_dtype=jnp.bfloat16,
                        platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the ViT classification forward (dense OR width/depth-
    materialized pytrees — the materialized forward dispatches on cfg).
    Call signature: (params, pixels [b, H, W, 3]) -> logits [b, classes]."""
    from ssp_x_vit_tpu.models.vit import vit_forward, vit_forward_materialized

    materialized = bool(getattr(cfg, "pruned_attention_blocks", ()))

    def fn(p, pixels):
        if materialized:
            return vit_forward_materialized(p, pixels, cfg,
                                            compute_dtype=compute_dtype)
        return vit_forward(p, pixels, cfg, compute_dtype=compute_dtype)[0]

    exported = jexport.export(jax.jit(fn), platforms=platforms)(
        _abstract(params),
        jax.ShapeDtypeStruct((batch, cfg.image_size, cfg.image_size, 3),
                             compute_dtype))
    return exported.serialize()


def load_artifact(blob: bytes) -> jexport.Exported:
    """Deserialize a serving artifact; run it with ``artifact.call(*args)``.
    No model code or tracing involved — the StableHLO compiles directly."""
    return jexport.deserialize(blob)


def save_bundle(bundle, path: str):
    """Write a bundle to ``<path>/<name>.stablehlo`` files."""
    import os

    os.makedirs(path, exist_ok=True)
    for name, blob in bundle.items():
        with open(os.path.join(path, f"{name}.stablehlo"), "wb") as f:
            f.write(blob)


def load_bundle(path: str):
    """Read a save_bundle directory back into {name: Exported}."""
    import glob
    import os

    out = {}
    for fp in glob.glob(os.path.join(path, "*.stablehlo")):
        with open(fp, "rb") as f:
            out[os.path.basename(fp)[: -len(".stablehlo")]] = jexport.deserialize(
                f.read())
    return out
