"""On-chip A/B of the flash-attention BACKWARD at LLM calibration dims
(b=4, h=32, s=2048, hd=128, bf16): the pallas single-pass backward kernel
vs XLA autodiff through the reference attention (which materializes the
[b, h, s, s] logits in both the recompute and the grad pass — ~2 GB f32 at
these dims). Times a full value_and_grad of sum(attention). Three arms:
flash fwd + pallas bwd (new default), flash fwd + XLA-autodiff bwd (the
round-1/2 custom_vjp fallback), and pure XLA sdpa fwd+bwd.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
from ssp_x_vit_tpu.ops.attention import sdpa_reference
from ssp_x_vit_tpu.ops.pallas.flash_attention import flash_attention


def main():
    b, h, s, hd = (int(os.environ.get(k, d)) for k, d in
                   (("BENCH_B", 4), ("BENCH_H", 32), ("BENCH_S", 2048),
                    ("BENCH_HD", 128)))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    print(f"backend={jax.default_backend()} b={b} h={h} s={s} hd={hd} bf16",
          flush=True)

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, hd), jnp.bfloat16)

    results = {}

    def bench(name, attn):
        def fwd_bwd(q_, k_, v_):
            def loss(t):
                return jnp.sum(attn(*t).astype(jnp.float32))
            l, g = jax.value_and_grad(loss)((q_, k_, v_))
            return l + sum(jnp.sum(t.astype(jnp.float32)) for t in g)

        ms = measure_latency_scan(fwd_bwd, q, k, v, iters=iters)
        results[name] = round(ms, 3)
        print(f"{name:>22}: {ms:8.3f} ms (fwd+bwd)", flush=True)

    import functools

    @functools.partial(jax.custom_vjp)
    def flash_fwd_xla_bwd(q_, k_, v_):
        return flash_attention(q_, k_, v_, causal=True)

    def _fwd(q_, k_, v_):
        return flash_fwd_xla_bwd(q_, k_, v_), (q_, k_, v_)

    def _bwd(res, g):
        q_, k_, v_ = res
        _, vjp = jax.vjp(lambda a, c, d: sdpa_reference(a, c, d, causal=True),
                         q_, k_, v_)
        return vjp(g)

    flash_fwd_xla_bwd.defvjp(_fwd, _bwd)

    bench("flash_pallas_bwd", lambda a, c, d: flash_attention(a, c, d, causal=True))
    bench("flash_fwd_xla_bwd", flash_fwd_xla_bwd)
    bench("xla_autodiff", lambda a, c, d: sdpa_reference(a, c, d, causal=True))

    # numerics: pallas bwd vs XLA autodiff grads at bf16 inputs
    import numpy as np

    def grads(attn):
        return jax.jit(jax.grad(
            lambda t: jnp.sum(attn(*t).astype(jnp.float32))))((q, k, v))

    gp, gr = grads(lambda a, c, d: flash_attention(a, c, d, causal=True)), \
        grads(lambda a, c, d: sdpa_reference(a, c, d, causal=True))
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
              for a, b_ in zip(gp, gr))
    results["max_abs_grad_err_bf16"] = err
    print(f"max |grad err| vs autodiff (bf16): {err:.2e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
