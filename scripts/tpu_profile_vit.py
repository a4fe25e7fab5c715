"""Per-component attribution of the dense ViT-B/16 b=256 bf16 forward (VERDICT
r2 #1: close / explain the dense-forward MFU gap).

jax.profiler traces are not retrievable over the axon tunnel, so attribution
is done by COMPONENT ABLATION inside one identical forward skeleton, timed
with the in-graph scan harness (docs/tpu_notes.md: host-side timing is
unreliable here). Variants differ ONLY in the attention core:

  full_prod      current production dispatch (fused attn-block + FFN kernels)
  xla            pure-XLA forward (sdpa f32 softmax) — the attribution base
  attn_identity  attention core replaced by v (matmuls/FFN/LN all intact)
                 -> (xla - attn_identity) = attention-core cost
  no_softmax     probs = scaled logits (no max/exp/sum; materialization kept)
                 -> isolates transcendental+reduction cost vs HBM round-trip
  bf16_logits    logits einsum emits bf16, softmax in bf16 (half the
                 attention-core HBM traffic)
  f32_probs_bf16 f32 max/exp, probs stored bf16 (default already casts to
                 v.dtype — listed for completeness via sdpa_reference)

Run: python scripts/tpu_profile_vit.py   (TPU; ~10 min of compiles first run)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from ssp_x_vit_tpu.ops.common import layer_norm, gelu
from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan


def make_forward(cfg: ViTConfig, attn_core):
    """XLA forward skeleton; ``attn_core(q, k, v) -> out`` plugs the variant."""
    nh, hd = cfg.num_heads, cfg.head_dim

    def fwd(pixels, params):
        from ssp_x_vit_tpu.models.vit import embed

        x = embed(params, cfg, pixels, pixels.dtype)

        def body(x, bp):
            b, s, d = x.shape
            h = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"], cfg.layernorm_eps)
            qkv = h @ bp["qkv_kernel"].astype(x.dtype) + bp["qkv_bias"].astype(x.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
                       for t in (q, k, v))
            out = attn_core(q, k, v)
            out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
            out = out @ bp["proj_kernel"].astype(x.dtype) + bp["proj_bias"].astype(x.dtype)
            x = x + out
            h2 = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"], cfg.layernorm_eps)
            hm = gelu(h2 @ bp["fc1_kernel"].astype(x.dtype) + bp["fc1_bias"].astype(x.dtype))
            x = x + (hm @ bp["fc2_kernel"].astype(x.dtype) + bp["fc2_bias"].astype(x.dtype))
            return x, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = layer_norm(x, params["ln_final_scale"], params["ln_final_bias"],
                       cfg.layernorm_eps)
        from ssp_x_vit_tpu.models.vit import apply_head

        return apply_head(params["head"], cfg, x[:, 0])

    return fwd


def sdpa_f32(q, k, v):
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def attn_identity(q, k, v):
    return v


def no_softmax(q, k, v):
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    # normalize by seq so magnitudes stay sane; no max/exp
    w = (logits / logits.shape[-1]).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def bf16_logits(q, k, v):
    scale = jnp.asarray(1.0 / jnp.sqrt(q.shape[-1]), jnp.bfloat16)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.bfloat16) * scale
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    cfg = ViTConfig(num_classes=1000)
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    pixels = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, 224, 224, 3), jnp.bfloat16)

    results = {}

    def bench(name, fn):
        ms = measure_latency_scan(fn, pixels, params, iters=iters)
        results[name] = round(ms, 2)
        print(f"{name:>16}: {ms:8.2f} ms/batch  ({batch / (ms / 1e3):7.1f} img/s)",
              flush=True)

    def prod(pixels, params):
        logits, _ = vit_forward(params, pixels, cfg, compute_dtype=jnp.bfloat16)
        return logits

    bench("full_prod", prod)
    bench("xla", make_forward(cfg, sdpa_f32))
    bench("attn_identity", make_forward(cfg, attn_identity))
    bench("no_softmax", make_forward(cfg, no_softmax))
    bench("bf16_logits", make_forward(cfg, bf16_logits))

    attn_core = results["xla"] - results["attn_identity"]
    softmax_part = results["xla"] - results["no_softmax"]
    print(json.dumps({
        "attn_core_ms_total": round(attn_core, 2),
        "softmax_ms_total": round(softmax_part, 2),
        "matmul_ms_total": round(results["no_softmax"] - results["attn_identity"], 2),
        "bf16_logits_gain_ms": round(results["xla"] - results["bf16_logits"], 2),
        **results,
    }))


if __name__ == "__main__":
    main()
