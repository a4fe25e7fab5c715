"""Latency / throughput measurement harness.

Reference protocol (experiments/vit_pruning/auto_2ssp.py:74-99): dummy input,
3 warmup iterations, 10 timed iterations, mean milliseconds. TPU equivalent
uses ``jax.block_until_ready`` in place of cuda/mps synchronization.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.models.vit import ViTConfig, vit_forward, vit_forward_materialized


def measure_latency_fn(
    fn: Callable,
    *args,
    warmup: int = 3,
    iters: int = 10,
) -> Tuple[float, float]:
    """Time ``fn(*args)`` -> (mean_ms, throughput_calls_per_s)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    mean_s = sum(times) / len(times)
    return mean_s * 1e3, 1.0 / mean_s


def measure_latency_scan(fn: Callable, *args, iters: int = 20, warmup: int = 1,
                         perturb_argnums=None) -> float:
    """Per-iteration latency (ms) with the loop INSIDE one jitted lax.scan.

    The carry consumes each iteration's output, forcing truly sequential
    device execution in a single dispatch. This is robust where host-side
    timing is not (remote/tunneled devices with unreliable readiness
    semantics). ``fn(*args)`` may return any pytree.

    ``perturb_argnums``: positional args whose float leaves get the
    anti-hoist carry perturbation (default: all). The perturbation is a
    full elementwise read+write pass over the array, so for probes with
    LARGE loop-invariant float operands (stacked weights) perturb only a
    small carry-dependent operand — one perturbed input already makes the
    body loop-variant, and the big operands are still re-streamed by the
    ops that consume them. Perturbing everything inflates weight-heavy
    probes ~3x (measured: the round-5 decode attribution).
    """
    import jax.numpy as _jnp

    # Arrays must be jit ARGUMENTS: closed-over device arrays are embedded as
    # program constants, which forces a device->host fetch at lowering time
    # (hangs on tunneled devices and bloats the executable).
    @jax.jit
    def run(*a):
        def step(carry, _):
            # Perturb selected floating-point array arguments by the
            # (runtime-unknown) carry so the body is NOT loop-invariant and
            # cannot be hoisted out of the scan. Integer args pass through.
            def perturb(leaf):
                if hasattr(leaf, "dtype") and _jnp.issubdtype(leaf.dtype, _jnp.floating):
                    return leaf + (carry * 1e-20).astype(leaf.dtype)
                return leaf
            sel = (range(len(a)) if perturb_argnums is None
                   else perturb_argnums)
            pa = [jax.tree.map(perturb, x) if i in set(sel) else x
                  for i, x in enumerate(a)]
            out = fn(*pa)
            acc = sum(_jnp.sum(leaf.astype(_jnp.float32)) for leaf in jax.tree.leaves(out))
            return _jnp.tanh(acc), ()  # tanh keeps the carry bounded

        total, _ = jax.lax.scan(step, _jnp.float32(0.0), None, length=iters)
        return total

    # On tunneled devices block_until_ready can return before execution
    # completes; fetching the scalar VALUE is the only reliable barrier.
    for _ in range(warmup):
        float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def measure_latency(
    params,
    cfg: ViTConfig,
    *,
    batch_size: int = 1,
    warmup: int = 3,
    iters: int = 10,
    compute_dtype=jnp.float32,
) -> float:
    """Mean forward latency (ms) on a dummy batch (reference auto_2ssp.py:74-99)."""
    dummy = jnp.zeros((batch_size, cfg.image_size, cfg.image_size, cfg.num_channels), compute_dtype)
    if cfg.is_materialized_pruned:
        def fn(x, p):
            return vit_forward_materialized(p, x, cfg, compute_dtype=compute_dtype)
    else:
        def fn(x, p):
            return vit_forward(p, x, cfg, compute_dtype=compute_dtype)[0]
    # In-graph scan timing: reliable on tunneled devices (docs/tpu_notes.md).
    return measure_latency_scan(fn, dummy, params, iters=iters, warmup=min(1, warmup))
