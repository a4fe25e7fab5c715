"""Per-component attribution of the 853M LLM train step (VERDICT r3 #4).

jax.profiler traces are not retrievable over the tunnel (docs/tpu_notes.md),
so — like the ViT forward attribution (scripts/tpu_profile_vit.py) — this
times IDENTICAL jitted skeletons that differ in exactly one component:

  full       production step: flash fwd + pallas bwd + per-layer remat + adamw
  fwd        forward loss only (no grad, no optimizer)
  grads      value_and_grad only (optimizer ablated; grads consumed via
             optax.global_norm so XLA cannot DCE the backward — adds one
             ~3.4 GB read pass, ~4 ms at HBM speed)
  opt        adamw update+apply only, on donated params-shaped grads
  noremat    full step with remat=False (no recompute FLOPs; may OOM — the
             point is whether the remat recompute shows up as time)
  sgd        full step with plain SGD (optimizer-traffic cross-check: sgd
             reads grads+params and writes params, ~1/2.3 of adamw's pass)

Decomposition reads: bwd = grads - fwd; optimizer = full - grads (cross-check
vs the opt arm, which measures the update WITHOUT overlap opportunities).

FLOP accounting (the round-3 "72% of ceiling" undercounted): with per-layer
remat the step executes fwd (2NT) + recompute of the scanned layers
(2·N_layers·T) + bwd (4NT) — about 27 TFLOP at 853M/b2/s2048, not the
textbook 6NT = 21 TFLOP. The script prints both rates.

  python scripts/tpu_profile_train.py [--arms full,fwd,grads,opt,noremat,sgd]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--arms", type=str,
                    default="full,fwd,grads,opt,noremat,sgd")
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--ffn", type=int, default=5632)
    ap.add_argument("--cpu", action="store_true", help="smoke-test on CPU")
    args = ap.parse_args()

    import functools

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
    from ssp_x_vit_tpu.llm.train import make_llama_train_step, next_token_loss

    cfg = LlamaConfig(vocab_size=32000, hidden_size=args.hidden,
                      num_layers=args.layers, num_heads=16, num_kv_heads=4,
                      intermediate_size=args.ffn)
    B, S = args.batch, args.seq
    T = B * (S - 1)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    opt = optax.adamw(1e-4)

    def fresh():
        return init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    params0 = fresh()
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params0))
    # scanned-layer params (everything except embed + lm_head + final norm):
    # stacked [L, ...] arrays under params["blocks"] — these are what the
    # per-layer remat recomputes during the backward
    n_layer = sum(int(np.prod(x.shape)) for path, x in
                  jax.tree_util.tree_leaves_with_path(params0)
                  if "blocks" in jax.tree_util.keystr(path))
    del params0

    res = {"batch": B, "seq": S, "params_M": round(n_params / 1e6, 1),
           "backend": jax.default_backend(), "arms": {}}

    def timed(name, run_step, make_state):
        """run_step(state) -> state; state carries donated buffers."""
        state = make_state()
        state = run_step(state)  # compile
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state = run_step(state)
        secs = (time.perf_counter() - t0) / args.steps
        res["arms"][name] = round(secs, 4)
        print(f"[{name}] {secs*1e3:.1f} ms/step", flush=True)
        return secs

    arms = set(args.arms.split(","))

    if "full" in arms:
        step = make_llama_train_step(cfg, opt)

        def make():
            p = fresh()
            return (p, opt.init(p))

        def run(state):
            p, o, loss = step(state[0], state[1], toks)
            _ = float(loss)  # barrier
            return (p, o)

        timed("full", run, make)

    if "fwd" in arms:
        loss_fn = jax.jit(functools.partial(next_token_loss, cfg=cfg))

        def run(state):
            _ = float(loss_fn(state[0], toks))
            return state

        timed("fwd", run, lambda: (fresh(),))

    if "grads" in arms:
        # params NOT donated (reused across iterations); grads consumed via
        # global_norm so the backward survives DCE. toks is a parameter, not
        # a closure: closed-over device arrays hang jit lowering on the
        # tunneled TPU (docs/tpu_notes.md item 3).
        @jax.jit
        def grad_step(p, toks):
            loss, g = jax.value_and_grad(next_token_loss)(p, toks, cfg)
            return loss, optax.global_norm(g)

        p_hold = fresh()

        def run(state):
            loss, gn = grad_step(p_hold, toks)
            _ = float(loss), float(gn)
            return state

        timed("grads", run, lambda: (None,))
        del p_hold

    if "opt" in arms:
        # p/o donated (updated in place, as in the real step); g reused
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def opt_step(p, o, g):
            updates, o = opt.update(g, o, p)
            p = optax.apply_updates(p, updates)
            return p, o, jax.tree.leaves(p)[0].ravel()[0]

        g_hold = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), fresh())

        def make():
            p = fresh()
            return (p, opt.init(p))

        def run(state):
            p, o, s = opt_step(state[0], state[1], g_hold)
            _ = float(s)
            return (p, o)

        timed("opt", run, make)
        del g_hold

    if "noremat" in arms:
        try:
            step_nr = make_llama_train_step(cfg, opt, remat=False)

            def make():
                p = fresh()
                return (p, opt.init(p))

            def run(state):
                p, o, loss = step_nr(state[0], state[1], toks)
                _ = float(loss)
                return (p, o)

            timed("noremat", run, make)
        except Exception as e:  # expected: RESOURCE_EXHAUSTED
            res["arms"]["noremat"] = f"OOM: {type(e).__name__}"
            print(f"[noremat] failed: {type(e).__name__}", flush=True)

    if "sgd" in arms:
        sgd = optax.sgd(1e-4)
        step_sgd = make_llama_train_step(cfg, sgd)

        def make():
            p = fresh()
            return (p, sgd.init(p))

        def run(state):
            p, o, loss = step_sgd(state[0], state[1], toks)
            _ = float(loss)
            return (p, o)

        timed("sgd", run, make)

    # FLOP rates for the full arm
    full = res["arms"].get("full")
    if isinstance(full, float):
        f6 = 6 * n_params * T
        fremat = f6 + 2 * n_layer * T
        res["tflop_6NT"] = round(f6 / 1e12, 2)
        res["tflop_with_remat_recompute"] = round(fremat / 1e12, 2)
        res["tf_s_6NT"] = round(f6 / full / 1e12, 1)
        res["tf_s_actual"] = round(fremat / full / 1e12, 1)
        res["tokens_per_s"] = round(T / full, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
