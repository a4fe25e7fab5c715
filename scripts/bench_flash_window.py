"""On-chip A/B: sliding-window flash attention, resident vs streaming.

The dispatch in ops/pallas/flash_attention.py switches to the streaming
kernel at ``s >= window + 2*BLOCK_KS`` (block-predication arithmetic: past
that point the streaming kernel issues strictly fewer MXU/exp blocks than
the resident rectangle). That switch point was derived, not measured —
this bench measures both kernels (plus XLA sdpa) across (s, window) pairs
straddling the predicted crossover via the SSP_X_VIT_FLASH_STREAMING
override, clearing jit caches between arms (CLAUDE.md round-3 gotcha:
env-var reads happen at trace time).

Run: python scripts/bench_flash_window.py   (prints one JSON line)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
from ssp_x_vit_tpu.ops.attention import sdpa_reference
from ssp_x_vit_tpu.ops.pallas import flash_attention as fa


def main():
    b = int(os.environ.get("BENCH_B", 2))
    h = int(os.environ.get("BENCH_H", 8))
    hd = int(os.environ.get("BENCH_HD", 128))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    cases = [(2048, 1024), (4096, 1024), (4096, 4096 - 512), (8192, 1024),
             (8192, 4096)]
    print(f"backend={jax.default_backend()} b={b} h={h} hd={hd} bf16 "
          f"BLOCK_KS={fa.BLOCK_KS}", flush=True)

    rng = np.random.default_rng(0)
    results = {"b": b, "h": h, "hd": hd, "block_ks": fa.BLOCK_KS,
               "backend": jax.default_backend(), "cases": []}
    for s, w in cases:
        q = jnp.asarray(rng.normal(size=(b, h, s, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, s, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, s, hd)), jnp.bfloat16)
        predicted_stream = s >= w + 2 * fa.BLOCK_KS
        row = {"s": s, "window": w, "predicted_stream": predicted_stream}
        for mode in ("never", "force"):
            os.environ["SSP_X_VIT_FLASH_STREAMING"] = mode
            jax.clear_caches()  # env read at trace time — force a retrace
            ms = measure_latency_scan(
                lambda q_, k_, v_: fa.flash_attention(
                    q_, k_, v_, causal=True, window=w),
                q, k, v, iters=iters)
            row["resident_ms" if mode == "never" else "streaming_ms"] = \
                round(ms, 3)
        os.environ.pop("SSP_X_VIT_FLASH_STREAMING", None)
        jax.clear_caches()
        ms = measure_latency_scan(
            lambda q_, k_, v_: sdpa_reference(q_, k_, v_, causal=True,
                                              window=w), q, k, v,
            iters=iters)
        row["xla_sdpa_ms"] = round(ms, 3)
        row["stream_wins"] = row["streaming_ms"] < row["resident_ms"]
        row["prediction_correct"] = row["stream_wins"] == predicted_stream
        print(row, flush=True)
        results["cases"].append(row)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
