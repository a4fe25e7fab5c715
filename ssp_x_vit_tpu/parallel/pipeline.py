"""Pipeline + tensor + data parallel LLM execution (GPipe schedule over ICI).

The reference scales multi-GPU runs with accelerate's sequential layer
placement (``device_map`` dispatch, src/slicegpt_utils/gpu_utils.py:70-91;
src/utilities.py:48) — layers are spread across devices but execute one at a
time, so N devices give ~1x throughput. The TPU-native replacement is a real
pipelined schedule:

- the stacked-block parameter layout (llm/model.py) shards its LEADING layer
  axis over a ``pipe`` mesh axis — each stage holds ``num_layers/pipe``
  contiguous blocks and runs them with ``lax.scan``;
- microbatches rotate stage-to-stage with ``lax.ppermute`` in a GPipe
  fill/drain schedule (M + P - 1 ticks for M microbatches over P stages);
- inside each stage the block runs megatron-style tensor parallelism with
  EXPLICIT ``psum`` collectives over ``model`` (column-parallel q/k/v/gate/up,
  row-parallel o/down) — this file is the manual-collective counterpart of
  the GSPMD specs in parallel/llm_sharding.py;
- the batch axis is data-parallel over ``data``.

Everything lives inside one ``jax.shard_map`` so XLA overlaps the ICI
transfers with stage compute, and the whole schedule is differentiable
(``ppermute``/``psum`` have exact transposes), so the same function backs the
pipelined training step.

Constraints: ``num_layers % pipe == 0``; ``num_heads``, ``num_kv_heads`` and
``intermediate_size`` divisible by ``model``; global batch divisible by
``num_microbatches * data``. Llama-layout configs incl. gemma/gemma-2
(scaled embeddings, tanh-gelu GLU, 4-norm blocks, softcaps, mixed
per-layer windows scanned as pipe-sharded band bounds) and phi-2
(parallel-residual); OPT is excluded (learned-position table, no
long-context use case), MoE runs expert-parallel instead.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.sharding import PartitionSpec as P_  # alias for scopes where P is shadowed

from ssp_x_vit_tpu.llm.model import (LlamaConfig, Params, rms_norm, _rope,
                                     _layer_norm, _glu_act, _head_logits)
from ssp_x_vit_tpu.ops.attention import sdpa_reference


def pipeline_block_specs(cfg: LlamaConfig) -> Dict[str, P]:
    """PartitionSpecs for the stacked block pytree on a (data, pipe, model)
    mesh: layer axis over 'pipe', megatron tp axes over 'model'.

    Column-parallel projections shard their OUTPUT dim (and their bias);
    row-parallel projections shard their INPUT dim, their bias is replicated
    (added once after the psum)."""
    if cfg.is_phi:
        return {
            "ln1": P("pipe", None), "ln1_bias": P("pipe", None),
            "q_kernel": P("pipe", None, "model"), "q_bias": P("pipe", "model"),
            "k_kernel": P("pipe", None, "model"), "k_bias": P("pipe", "model"),
            "v_kernel": P("pipe", None, "model"), "v_bias": P("pipe", "model"),
            "o_kernel": P("pipe", "model", None), "o_bias": P("pipe", None),
            "fc1_kernel": P("pipe", None, "model"), "fc1_bias": P("pipe", "model"),
            "fc2_kernel": P("pipe", "model", None), "fc2_bias": P("pipe", None),
        }
    specs = {
        "ln1": P("pipe", None),
        "q_kernel": P("pipe", None, "model"),
        "k_kernel": P("pipe", None, "model"),
        "v_kernel": P("pipe", None, "model"),
        "o_kernel": P("pipe", "model", None),
        "ln2": P("pipe", None),
        "gate_kernel": P("pipe", None, "model"),
        "up_kernel": P("pipe", None, "model"),
        "down_kernel": P("pipe", "model", None),
    }
    if cfg.qkv_bias:
        specs.update(q_bias=P("pipe", "model"), k_bias=P("pipe", "model"),
                     v_bias=P("pipe", "model"))
    if cfg.is_gemma2:
        specs.update(ln1_post=P("pipe", None), ln2_post=P("pipe", None))
    return specs


def shard_llama_params_pipeline(params: Params, mesh: Mesh, cfg: LlamaConfig) -> Params:
    """Place params for the (data, pipe, model) pipeline mesh."""
    specs: Dict[str, Any] = {
        "embed": P(None, None),
        "blocks": pipeline_block_specs(cfg),
        "ln_final": P(None),
    }
    # replicate any remaining top-level leaves (phi: ln_final_bias,
    # lm_head_bias; untied head: lm_head)
    for k, v in params.items():
        if k not in specs:
            specs[k] = P(*([None] * np.ndim(v)))
    return jax.tree.map(
        lambda spec, leaf: jax.device_put(leaf, NamedSharding(mesh, spec)),
        specs, params, is_leaf=lambda x: isinstance(x, P))


def _tp_block(x, bp, cfg: LlamaConfig, compute_dtype, tp: int,
              window_override=None):
    """One llama block on LOCAL tensor-parallel shards of its weights.

    x is replicated over 'model'; q/k/v/gate/up are column-sharded (local
    output dim), o/down row-sharded (local input dim) — the partial products
    are summed with an explicit psum, exactly the megatron dataflow.

    ``window_override``: traced per-layer band bound for mixed-window
    configs (gemma-2/qwen2); None keeps the config's static window. Gemma-2
    post-norms and the attention softcap ride the same block.
    """
    b, s, _ = x.shape
    nq, nkv, hd = cfg.num_heads // tp, cfg.num_kv_heads // tp, cfg.head_dim

    h = rms_norm(x, bp["ln1"], cfg.rms_eps)
    q = h @ bp["q_kernel"].astype(compute_dtype)
    k = h @ bp["k_kernel"].astype(compute_dtype)
    v = h @ bp["v_kernel"].astype(compute_dtype)
    if "q_bias" in bp:
        q = q + bp["q_bias"].astype(compute_dtype)
        k = k + bp["k_bias"].astype(compute_dtype)
        v = v + bp["v_bias"].astype(compute_dtype)
    q = q.reshape(b, s, nq, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm:
        # qwen3 per-head RMSNorm: head_dim is unsharded, so the replicated
        # [hd] scales apply to the local head shards unchanged
        q = rms_norm(q, bp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, bp["k_norm"], cfg.rms_eps)
    q, k = _rope(q, k, cfg)
    if nkv != nq:
        rep = nq // nkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if window_override is not None:
        _w = window_override
    else:
        _w = cfg.sliding_window
        _w = None if (_w is None or _w >= s) else _w
    out = sdpa_reference(q, k, v, causal=True, window=_w,
                         softcap=cfg.attn_softcap)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, nq * hd)
    out = lax.psum(out @ bp["o_kernel"].astype(compute_dtype), "model")
    if cfg.is_gemma2:
        # gemma-2 post-norms on the residual deltas (llm/model.py)
        out = rms_norm(out, bp["ln1_post"], cfg.rms_eps)
    x = x + out

    h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
    g = h2 @ bp["gate_kernel"].astype(compute_dtype)
    u = h2 @ bp["up_kernel"].astype(compute_dtype)
    m = lax.psum((_glu_act(cfg)(g) * u) @ bp["down_kernel"].astype(compute_dtype),
                 "model")
    if cfg.is_gemma2:
        m = rms_norm(m, bp["ln2_post"], cfg.rms_eps)
    return x + m


def _tp_block_phi(x, bp, cfg: LlamaConfig, compute_dtype, tp: int,
                  window_override=None):
    """phi-2 parallel-residual block on local TP shards: one LayerNorm feeds
    BOTH branches (llm/model.py llama_forward). q/k/v/fc1 are column-parallel
    so their biases are local shard slices; o/fc2 are row-parallel so their
    biases are replicated and added once AFTER the psum."""
    from ssp_x_vit_tpu.ops.common import gelu

    b, s, _ = x.shape
    nq, nkv, hd = cfg.num_heads // tp, cfg.num_kv_heads // tp, cfg.head_dim

    h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
    q = h @ bp["q_kernel"].astype(compute_dtype) + bp["q_bias"].astype(compute_dtype)
    k = h @ bp["k_kernel"].astype(compute_dtype) + bp["k_bias"].astype(compute_dtype)
    v = h @ bp["v_kernel"].astype(compute_dtype) + bp["v_bias"].astype(compute_dtype)
    q = q.reshape(b, s, nq, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    rd = cfg.rotary_dim
    if rd is not None and rd < hd:  # phi partial rotary
        q_rot, k_rot = _rope(q[..., :rd], k[..., :rd], cfg)
        q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
        k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
    else:
        q, k = _rope(q, k, cfg)
    if nkv != nq:
        rep = nq // nkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    _w = cfg.sliding_window
    _w = None if (_w is None or _w >= s) else _w
    out = sdpa_reference(q, k, v, causal=True, window=_w)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, nq * hd)
    attn = lax.psum(out @ bp["o_kernel"].astype(compute_dtype), "model") \
        + bp["o_bias"].astype(compute_dtype)

    hm = h @ bp["fc1_kernel"].astype(compute_dtype) + bp["fc1_bias"].astype(compute_dtype)
    mlp = lax.psum(gelu(hm) @ bp["fc2_kernel"].astype(compute_dtype), "model") \
        + bp["fc2_bias"].astype(compute_dtype)
    return x + attn + mlp


def make_pipeline_forward(mesh: Mesh, cfg: LlamaConfig, *, num_microbatches: int,
                          compute_dtype=jnp.float32):
    """Build ``forward(params, tokens[b, s]) -> logits[b, s, V] (fp32)``.

    The block stack runs pipelined inside shard_map; the lm_head runs outside
    under plain GSPMD (tokens/batch sharded over 'data').
    """
    n_pipe = mesh.shape["pipe"]
    tp = mesh.shape["model"]
    if cfg.num_layers % n_pipe:
        raise ValueError(f"num_layers {cfg.num_layers} % pipe {n_pipe} != 0")
    for name, v in (("num_heads", cfg.num_heads), ("num_kv_heads", cfg.num_kv_heads),
                    ("intermediate_size", cfg.intermediate_size)):
        if v % tp:
            raise ValueError(f"{name} {v} % model {tp} != 0")
    if cfg.is_opt:
        raise ValueError("pipeline path covers llama-layout (incl. gemma/"
                         "gemma-2) and phi configs (OPT's learned-position "
                         "table tops out at 2048)")
    if cfg.num_experts:
        raise ValueError("MoE blocks run expert-parallel (parallel/moe.py) "
                         "or FSDP, not the pipeline TP block")
    block_fn = _tp_block_phi if cfg.is_phi else _tp_block
    M = num_microbatches
    # mixed per-layer windows: the [L] band-bound vector shards its layer
    # axis over 'pipe' alongside the blocks and rides each stage's scan
    mixed = cfg.sliding_window is not None and not cfg.uniform_window
    wbounds_arr = np.asarray(cfg.layer_window_bounds if mixed
                             else [0] * cfg.num_layers, np.int32)

    def sched(blocks, embed, wbounds, tokens_mb):
        """blocks: local [L/P, ...] shards; tokens_mb: [M, mb_local, s]."""
        p = lax.axis_index("pipe")
        mb, s = tokens_mb.shape[1], tokens_mb.shape[2]
        emb = embed.astype(compute_dtype)
        if cfg.scale_embeddings:
            # gemma sqrt(d) embedding scale (normalizer rounded to the
            # compute dtype, llm/model.py _embed_tokens); scaling the table
            # equals scaling every lookup.
            emb = emb * jnp.asarray(cfg.hidden_size ** 0.5, compute_dtype)

        def stage(xx):
            def body(xx, scanned):
                bp, wb = scanned
                return block_fn(xx, bp, cfg, compute_dtype, tp,
                                window_override=wb if mixed else None), None
            xx, _ = lax.scan(body, xx, (blocks, wbounds))
            return xx

        state = jnp.zeros((mb, s, cfg.hidden_size), compute_dtype)
        outputs = jnp.zeros((M, mb, s, cfg.hidden_size), compute_dtype)

        def step(carry, t):
            state, outputs = carry
            # previous tick's results advance one stage (stage 0 receives the
            # wrap-around garbage from the last stage and overwrites it below)
            state = lax.ppermute(
                state, "pipe", [(i, (i + 1) % n_pipe) for i in range(n_pipe)])
            fresh = emb[tokens_mb[jnp.clip(t, 0, M - 1)]]
            state = jnp.where(p == 0, fresh, state)
            state = stage(state)
            out_idx = t - (n_pipe - 1)
            valid = jnp.logical_and(p == n_pipe - 1, out_idx >= 0)
            outputs = outputs.at[jnp.clip(out_idx, 0, M - 1)].add(
                jnp.where(valid, state, 0).astype(outputs.dtype))
            return (state, outputs), None

        (_, outputs), _ = lax.scan(step, (state, outputs),
                                   jnp.arange(M + n_pipe - 1))
        # only the last stage wrote non-zeros; broadcast the result everywhere
        return lax.psum(outputs, "pipe")

    mapped = jax.shard_map(
        sched, mesh=mesh,
        in_specs=(pipeline_block_specs(cfg), P(None, None), P("pipe"),
                  P(None, "data", None)),
        out_specs=P(None, "data", None, None),
        check_vma=False,
    )

    def forward(params: Params, tokens: jax.Array) -> jax.Array:
        b, s = tokens.shape
        if b % M:
            raise ValueError(f"batch {b} % num_microbatches {M} != 0")
        tokens_mb = tokens.reshape(M, b // M, s)
        hidden = mapped(params["blocks"], params["embed"],
                        jnp.asarray(wbounds_arr), tokens_mb)
        hidden = hidden.reshape(b, s, cfg.hidden_size)
        if cfg.is_phi:
            x = _layer_norm(hidden, params["ln_final"], params["ln_final_bias"],
                            cfg.layer_norm_eps)
        else:
            x = rms_norm(hidden, params["ln_final"], cfg.rms_eps)
        return _head_logits(params, x, compute_dtype, cfg.final_softcap)

    return forward


def make_pipeline_train_step(mesh: Mesh, cfg: LlamaConfig, optimizer, *,
                             num_microbatches: int, compute_dtype=jnp.float32,
                             schedule: str = "gpipe"):
    """Jitted ``(params, opt_state, tokens) -> (params, opt_state, loss)``.

    ``schedule``:

    - ``"gpipe"`` — autodiff through the forward schedule: all M forwards,
      then all M backwards (the reverse scan). Simple, but every stage holds
      residuals for ALL M in-flight microbatches.
    - ``"1f1b"`` — the memory-bounded one-forward-one-backward schedule
      (make_pipeline_train_step_1f1b): each stage holds at most 2P-1 saved
      microbatch inputs regardless of M.

    Bubble accounting (docs/parallelism.md): both schedules idle each stage
    for P-1 of the M+P-1 forward ticks and P-1 of the backward ticks —
    bubble fraction (P-1)/(M+P-1), shrinking with more microbatches. 1F1B's
    win over GPipe is activation MEMORY (O(P) vs O(M) microbatches), not
    bubble; an interleaved (virtual-stage) variant would shrink the bubble
    itself and is not implemented.
    """
    import optax

    if schedule == "1f1b":
        return make_pipeline_train_step_1f1b(
            mesh, cfg, optimizer, num_microbatches=num_microbatches,
            compute_dtype=compute_dtype)
    if schedule != "gpipe":
        raise ValueError(f"unknown pipeline schedule {schedule!r} "
                         "(gpipe | 1f1b)")

    fwd = make_pipeline_forward(mesh, cfg, num_microbatches=num_microbatches,
                                compute_dtype=compute_dtype)

    def loss_fn(params, tokens):
        logits = fwd(params, tokens)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
        return nll.mean()

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_pipeline_train_step_1f1b(mesh: Mesh, cfg: LlamaConfig, optimizer, *,
                                  num_microbatches: int,
                                  compute_dtype=jnp.float32):
    """1F1B pipelined train step: same (data, pipe, model) mesh, param
    layout, and loss as the GPipe step, but the backward pass is scheduled
    MANUALLY so it starts as soon as each microbatch clears the last stage.

    Lockstep-SPMD encoding: one ``lax.scan`` of T = M + 2P - 2 ticks; each
    tick every stage runs one forward sub-step AND one backward sub-step.
    Stage p forwards microbatch m at tick ``t = m + p`` (GPipe fill) and
    backwards it at ``t = m + 2P - 2 - p`` — the last stage backwards a
    microbatch the same tick it forwards it (the "1F" immediately followed
    by its "1B"), and cotangents ride a reverse ``ppermute``. A stage
    therefore holds at most ``2(P-1-p)`` undrained microbatches: saved
    stage INPUTS live in a ring buffer of 2P-1 slots and the stage vjp is
    recomputed from them at backward time (activation memory O(P)
    microbatches, independent of M — GPipe-through-autodiff stores O(M)).

    The per-stage ``jax.vjp`` composes to exactly the same chain autodiff
    builds for the GPipe step (the head/loss vjp seeds the cotangent at the
    last stage; the embedding-lookup transpose is an explicit scatter-add at
    stage 0), so gradients match the single-device step to tolerance.
    """
    import optax

    n_pipe, tp = mesh.shape["pipe"], mesh.shape["model"]
    n_data = mesh.shape["data"]
    M, P = num_microbatches, n_pipe
    if cfg.num_layers % n_pipe:
        raise ValueError(f"num_layers {cfg.num_layers} % pipe {n_pipe} != 0")
    if cfg.is_opt:
        raise ValueError("pipeline path covers llama-layout and phi configs")
    if cfg.num_experts:
        raise ValueError("MoE blocks run expert-parallel, not the pipeline")
    block_fn = _tp_block_phi if cfg.is_phi else _tp_block
    mixed = cfg.sliding_window is not None and not cfg.uniform_window
    wbounds_arr = np.asarray(cfg.layer_window_bounds if mixed
                             else [0] * cfg.num_layers, np.int32)
    B = 2 * P - 1            # ring-buffer slots (max in-flight = 2P-2)
    T = M + 2 * P - 2        # total ticks
    ct_scale = 1.0 / (M * n_data)  # global-mean-loss cotangent
    # PARTIAL-handoff convention over 'model': inside a vjp, the transpose
    # of each lax.psum SUMS the per-device cotangents arriving at it — so
    # cotangents passed BETWEEN vjp calls must be per-device partials whose
    # model-psum is the true cotangent. The head loss is replicated over
    # 'model', so its seed is ct_scale/tp (tp identical copies sum to the
    # true seed); grads of model-REPLICATED leaves come out partial and are
    # psum'd over 'model' at the end, while model-SHARDED leaves see true
    # cotangents inside the vjp (the psum transpose restores them) and need
    # no model reduction.
    ct_seed = ct_scale / tp

    head_keys = [k for k in ("ln_final", "ln_final_bias", "lm_head",
                             "lm_head_bias")]

    def sched(blocks, embed, head, wbounds, tokens_mb):
        p = lax.axis_index("pipe")
        mb, s = tokens_mb.shape[1], tokens_mb.shape[2]
        emb_n = jnp.asarray(cfg.hidden_size ** 0.5, compute_dtype) \
            if cfg.scale_embeddings else jnp.asarray(1.0, compute_dtype)

        def stage_fn(xx, bb):
            def body(xx, scanned):
                bp, wb = scanned
                return block_fn(xx, bp, cfg, compute_dtype, tp,
                                window_override=wb if mixed else None), None
            xx, _ = lax.scan(body, xx, (bb, wbounds))
            return xx

        def head_loss(y, emb_arg, head_arg, toks):
            """Final norm + lm_head + mean NLL for one microbatch (the tail
            the GPipe step runs outside shard_map)."""
            if cfg.is_phi:
                x = _layer_norm(y, head_arg["ln_final"],
                                head_arg["ln_final_bias"], cfg.layer_norm_eps)
            else:
                x = rms_norm(y, head_arg["ln_final"], cfg.rms_eps)
            hp = dict(head_arg)
            hp["embed"] = emb_arg  # tied-head fallback inside _head_logits
            logits = _head_logits(hp, x, compute_dtype, cfg.final_softcap)
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            return -jnp.take_along_axis(
                logp, toks[:, 1:, None], axis=-1)[..., 0].mean()

        f32 = jnp.float32
        carry0 = (
            jnp.zeros((mb, s, cfg.hidden_size), compute_dtype),   # state_f
            jnp.zeros((mb, s, cfg.hidden_size), compute_dtype),   # ct
            jnp.zeros((B, mb, s, cfg.hidden_size), compute_dtype),  # ring buf
            jax.tree.map(lambda a: jnp.zeros(a.shape, f32), blocks),
            jnp.zeros(embed.shape, f32),                           # d embed
            jax.tree.map(lambda a: jnp.zeros(a.shape, f32), head),
            jnp.zeros((), f32),                                    # loss acc
        )

        def tick(carry, t):
            state_f, ct, buf, dbl, demb, dhead, loss = carry
            # ---- forward sub-step -------------------------------------
            state_f = lax.ppermute(
                state_f, "pipe", [(i, (i + 1) % P) for i in range(P)])
            m_f = t - p
            fwd_on = jnp.logical_and(m_f >= 0, m_f < M)
            fresh = (embed.astype(compute_dtype) * emb_n)[
                tokens_mb[jnp.clip(t, 0, M - 1)]]
            x_in = jnp.where(p == 0, fresh, state_f)
            slot_f = jnp.clip(m_f, 0, T) % B
            buf = buf.at[slot_f].set(
                jnp.where(fwd_on, x_in, buf[slot_f]))
            state_f = stage_fn(x_in, blocks)

            # ---- head + loss at the last stage ------------------------
            m_hd = t - (P - 1)
            hd_on = jnp.logical_and(
                p == P - 1, jnp.logical_and(m_hd >= 0, m_hd < M))
            toks_hd = tokens_mb[jnp.clip(m_hd, 0, M - 1)]
            loss_m, head_vjp = jax.vjp(
                lambda y, e, h: head_loss(y, e, h, toks_hd),
                state_f, embed, head)
            dy, demb_hd, dhead_m = head_vjp(jnp.asarray(ct_seed, f32))
            loss = loss + jnp.where(hd_on, loss_m * ct_scale, 0.0)
            demb = demb + jnp.where(hd_on, demb_hd.astype(f32), 0.0)
            dhead = jax.tree.map(
                lambda acc, g: acc + jnp.where(hd_on, g.astype(f32), 0.0),
                dhead, dhead_m)

            # ---- backward sub-step ------------------------------------
            ct = lax.ppermute(
                ct, "pipe", [(i, (i - 1) % P) for i in range(P)])
            ct = jnp.where(p == P - 1, dy.astype(compute_dtype), ct)
            m_b = t - (2 * P - 2 - p)
            bwd_on = jnp.logical_and(m_b >= 0, m_b < M)
            slot_b = jnp.clip(m_b, 0, T) % B
            x_saved = buf[slot_b]
            _, stage_vjp = jax.vjp(stage_fn, x_saved, blocks)
            dx, dbl_m = stage_vjp(ct)
            dbl = jax.tree.map(
                lambda acc, g: acc + jnp.where(bwd_on, g.astype(f32), 0.0),
                dbl, dbl_m)
            # embedding-lookup transpose at stage 0 (fresh = (emb*n)[toks])
            toks_b = tokens_mb[jnp.clip(m_b, 0, M - 1)]
            emb_on = jnp.logical_and(p == 0, bwd_on)
            demb = demb.at[toks_b].add(
                jnp.where(emb_on, (dx * emb_n).astype(f32), 0.0))
            ct = dx
            return (state_f, ct, buf, dbl, demb, dhead, loss), None

        (_, _, _, dbl, demb, dhead, loss), _ = lax.scan(
            tick, carry0, jnp.arange(T))
        # model-SHARDED block grads are local (true cotangents inside the
        # vjp): reduce over 'data' only. Model-REPLICATED leaves (norms,
        # row-parallel biases) accumulated per-device partials: psum over
        # 'model' too.
        dbl = {k: lax.psum(v, ("data", "model"))
               if "model" not in tuple(bspecs[k])
               else lax.psum(v, "data") for k, v in dbl.items()}
        # embed/head grads: only stage 0 / stage P-1 contributed (reduce
        # over 'pipe'), and both are per-device model partials (the lookup
        # dx and the ct_seed-scaled head vjp).
        demb = lax.psum(demb, ("pipe", "data", "model"))
        dhead = jax.tree.map(
            lambda g: lax.psum(g, ("pipe", "data", "model")), dhead)
        loss = lax.psum(loss, ("pipe", "data"))
        return loss, dbl, demb, dhead

    bspecs = pipeline_block_specs(cfg)

    def grads_fn(params, tokens):
        b, s = tokens.shape
        if b % M:
            raise ValueError(f"batch {b} % num_microbatches {M} != 0")
        head = {k: params[k] for k in head_keys if k in params}
        hspec = {k: P_(*([None] * np.ndim(v))) for k, v in head.items()}
        mapped = jax.shard_map(
            sched, mesh=mesh,
            in_specs=(bspecs, P_(None, None), hspec, P_("pipe"),
                      P_(None, "data", None)),
            out_specs=(P_(), bspecs, P_(None, None), hspec),
            check_vma=False,
        )
        tokens_mb = tokens.reshape(M, b // M, s)
        loss, dbl, demb, dhead = mapped(
            params["blocks"], params["embed"], head,
            jnp.asarray(wbounds_arr), tokens_mb)
        grads = {"blocks": dbl, "embed": demb, **dhead}
        # cast grads to the param dtypes; zero any param leaf the schedule
        # doesn't touch (none today, but keeps the pytrees congruent)
        grads = {k: jax.tree.map(lambda g, a: g.astype(a.dtype), grads[k],
                                 params[k]) if k in grads
                 else jax.tree.map(jnp.zeros_like, params[k])
                 for k in params}
        return loss, grads

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = grads_fn(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_pipeline_mesh(data: int = 1, pipe: int = 2, model: int = 1,
                       devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * pipe * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(data, pipe, model),
                ("data", "pipe", "model"))
