"""DeepSeek/MLA parallelism: latent-ring sequence parallelism and a
dp x pp x tp pipeline for dense-MLP configs.

Closes the MLA parallelism asymmetry vs the llama family (which has tp /
pp / ring / FSDP): DeepseekConfig gets

- **sequence-parallel NLL over an MLA-native latent ring**
  (:func:`mla_ring_attention`): instead of rotating expanded per-head K/V
  ([b, nq, sl, qk_hd + vd] per hop, what a naive port of
  parallel/ring_attention.py would send), the ring rotates the COMPRESSED
  latent cache pair (c_norm [b, sl, kv_lora_rank], k_rot [b, sl, rope_dim])
  and each device re-expands the received chunk with its replicated
  ``kv_b_kernel``. ICI bytes per hop drop by
  ``nq*(qk_nope+vd+rope)/(kv_lora_rank+rope)`` (~18x for V3 geometry:
  128 heads * 320 dims vs 512+64) at the cost of re-running the kv_b
  expansion once per hop — the same compute-for-bandwidth trade MLA's
  absorbed decode makes, and the reason the latent formulation exists.
  This is the long-context evaluation path (reference has none; its
  estimator is single-GPU s=2048, src/evaluation.py:24-64).
- **FSDP training** via the shape-driven specs in parallel/llm_sharding.py
  (fsdp_llama_param_specs_like treats dense_blocks/moe_blocks as stacked
  groups) — re-exported here as the deepseek entry points.
- **pipeline parallelism** (GPipe fill/drain, microbatches rotating with
  ``lax.ppermute`` — the schedule of parallel/pipeline.py) with megatron
  tensor parallelism INSIDE each stage: column-parallel q/q_b and kv_b
  (head-major output dims -> contiguous head groups), row-parallel o and
  down with explicit ``psum``; the kv_a latent projection is tiny
  (d x (kvr+rd)) and stays replicated, so every model shard derives the
  same latent and only expands its own heads. MoE configs are refused,
  matching the llama pipeline's refusal (routed experts run
  expert-parallel, parallel/moe.py / llm_sharding.py specs — an [E, d, f]
  einsum does not decompose along a pipe stage's scan).

The reference's only multi-device machinery is accelerate layer placement
(src/slicegpt_utils/gpu_utils.py:70-91); none of it covers MLA.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssp_x_vit_tpu.llm.deepseek import (DeepseekConfig, _apply_rope,
                                        _deepseek_moe, _glu, _head_logits,
                                        _mla_compressed, _mla_expand_kv,
                                        _mla_q, _mm, _rms, _rope_tables,
                                        mla_softmax_scale)
from ssp_x_vit_tpu.llm.model import Params

_NEG = -1e30


# --------------------------------------------------------------------------
# latent-ring attention
# --------------------------------------------------------------------------

def mla_ring_attention(q_nope, q_rot, c_norm, k_rot, bp,
                       cfg: DeepseekConfig, axis_name: str, *,
                       n_chunks: int, dt) -> jax.Array:
    """Causal MLA attention over a sequence-sharded latent ring.

    q_nope [b, nq, sl, nope], q_rot [b, nq, sl, rd] (rope applied at GLOBAL
    positions); c_norm [b, sl, kvr] / k_rot [b, sl, rd] are the LOCAL
    compressed chunk (post-kv_a_layernorm / post-rope — exactly the serving
    cache contents, llm/deepseek._mla_compressed). The latent pair rotates
    with ``lax.ppermute``; each hop re-expands k_nope/v from the received
    c_norm via the replicated kv_b_kernel and accumulates a flash-style
    online softmax. Masking uses global positions: the chunk held after r
    rotations originated on device (p - r) mod N.

    Returns the local context chunk [b, nq, sl, v_head_dim] (pre-o_kernel).
    """
    p = lax.axis_index(axis_name)
    b, nq, sl, _ = q_nope.shape
    vd = cfg.v_head_dim
    scale = mla_softmax_scale(cfg)
    qn32 = q_nope.astype(jnp.float32) * scale
    qr32 = q_rot.astype(jnp.float32) * scale
    iq = jnp.arange(sl)
    perm = [(i, (i + 1) % n_chunks) for i in range(n_chunks)]

    m = jnp.full((b, nq, sl), _NEG, jnp.float32)
    l = jnp.zeros((b, nq, sl), jnp.float32)
    acc = jnp.zeros((b, nq, sl, vd), jnp.float32)

    def step(carry, r):
        m, l, acc, c, kr = carry
        src = jnp.mod(p - r, n_chunks)
        # expand the received latent chunk with the local (replicated) kv_b
        k_nope, v = _mla_expand_kv(c, bp, cfg, dt)   # [b, nq, sl, nope/vd]
        s_ = (jnp.einsum("bhqn,bhkn->bhqk", qn32,
                         k_nope.astype(jnp.float32))
              + jnp.einsum("bhqr,bkr->bhqk", qr32, kr.astype(jnp.float32)))
        qpos = p * sl + iq[:, None]
        kpos = src * sl + iq[None, :]
        s_ = jnp.where((qpos >= kpos)[None, None], s_, _NEG)
        m_new = jnp.maximum(m, jnp.max(s_, axis=-1))
        alpha = jnp.exp(m - m_new)
        pexp = jnp.exp(s_ - m_new[..., None])
        l = l * alpha + jnp.sum(pexp, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkv->bhqv", pexp, v.astype(jnp.float32))
        c = lax.ppermute(c, axis_name, perm)
        kr = lax.ppermute(kr, axis_name, perm)
        return (m_new, l, acc, c, kr), None

    (m, l, acc, _, _), _ = lax.scan(step, (m, l, acc, c_norm, k_rot),
                                    jnp.arange(n_chunks))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(dt)


def make_deepseek_seq_parallel_nll(mesh: Mesh, cfg: DeepseekConfig,
                                   compute_dtype=jnp.float32):
    """Build ``(params, tokens[b, s]) -> per-window NLL sums [b]``: sequence
    over mesh axis 'seq' (latent ring), batch over 'data', params
    replicated. Matches llm/evaluation.py's (s-1)-token estimator exactly —
    the MLA counterpart of parallel/ring_attention.make_seq_parallel_nll.

    MoE blocks run locally: routing is per-token (sigmoid top-k over the
    replicated router), so a sequence shard routes its own tokens with no
    collective. Quantized (_q/_scale) params ride _mm unchanged.
    """
    sp = mesh.shape["seq"]
    dt = compute_dtype

    def inner(params, tokens):
        pidx = lax.axis_index("seq")
        b, s = tokens.shape
        sl = s // sp
        start = pidx * sl
        tok_local = lax.dynamic_slice_in_dim(tokens, start, sl, axis=1)
        positions = start + jnp.arange(sl)
        x = params["embed"].astype(dt)[tok_local]
        cos, sin = _rope_tables(cfg, positions)               # [sl, rd]

        def block(x, bp, moe):
            h = _rms(x, bp["ln1"], cfg.rms_eps)
            q = _mla_q(h, bp, cfg, dt)                        # [b,nq,sl,qk]
            q_nope, q_rot = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)
            c_norm, k_rot_raw = _mla_compressed(h, bp, cfg, dt)
            q_rot = _apply_rope(q_rot, cos[None, None], sin[None, None],
                                cfg.rope_interleave)
            k_rot = _apply_rope(k_rot_raw, cos[None], sin[None],
                                cfg.rope_interleave)          # [b, sl, rd]
            ctx = mla_ring_attention(q_nope, q_rot, c_norm, k_rot, bp, cfg,
                                     "seq", n_chunks=sp, dt=dt)
            out = ctx.transpose(0, 2, 1, 3).reshape(
                b, sl, cfg.num_heads * cfg.v_head_dim)
            x = x + _mm(out, bp, "o_kernel", dt)
            h2 = _rms(x, bp["ln2"], cfg.rms_eps)
            mlp = (_deepseek_moe(h2, bp, cfg, dt) if moe
                   else _glu(h2, bp, dt))
            return x + mlp

        def scan_group(x, blocks, moe):
            def body(x, bp):
                return block(x, bp, moe), None
            x, _ = lax.scan(body, x, blocks)
            return x

        if cfg.n_dense_layers:
            x = scan_group(x, params["dense_blocks"], False)
        if cfg.n_moe_layers:
            x = scan_group(x, params["moe_blocks"], True)
        x = _rms(x, params["ln_final"], cfg.rms_eps)
        logits = _head_logits(x, params, dt)

        tok_pad = jnp.pad(tokens, ((0, 0), (0, 1)))
        targets = lax.dynamic_slice_in_dim(tok_pad, start + 1, sl, axis=1)
        valid = (positions < s - 1).astype(jnp.float32)[None, :]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, :, None], axis=-1)[..., 0]
        return lax.psum(jnp.sum(nll * valid, axis=1), "seq")

    def run(params: Params, tokens: jax.Array) -> jax.Array:
        s = tokens.shape[1]
        if s % sp:
            raise ValueError(f"seq_len {s} % seq axis {sp} != 0")
        mapped = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(), params), P("data", None)),
            out_specs=P("data"),
            check_vma=False,
        )
        return mapped(params, tokens)

    return run


# --------------------------------------------------------------------------
# pipeline (dense-MLP MLA configs)
# --------------------------------------------------------------------------

def deepseek_pipeline_block_specs(cfg: DeepseekConfig) -> Dict[str, P]:
    """PartitionSpecs for the stacked dense_blocks pytree on a
    (data, pipe, model) mesh: layer axis over 'pipe'; head-major
    output-dim kernels (q / q_b / kv_b) column-parallel over 'model'
    (equal last-axis parts == contiguous head groups), o / down
    row-parallel; the latent kv_a projection + norms replicated per layer.
    """
    specs = {
        "ln1": P("pipe", None), "ln2": P("pipe", None),
        "kv_a_kernel": P("pipe", None, None),
        "kv_a_norm": P("pipe", None),
        "kv_b_kernel": P("pipe", None, "model"),
        "o_kernel": P("pipe", "model", None),
        "gate_kernel": P("pipe", None, "model"),
        "up_kernel": P("pipe", None, "model"),
        "down_kernel": P("pipe", "model", None),
    }
    if cfg.q_lora_rank is None:
        specs["q_kernel"] = P("pipe", None, "model")
    else:
        specs.update(q_a_kernel=P("pipe", None, None),
                     q_a_norm=P("pipe", None),
                     q_b_kernel=P("pipe", None, "model"))
    return specs


def shard_deepseek_params_pipeline(params: Params, mesh: Mesh,
                                   cfg: DeepseekConfig) -> Params:
    specs: Dict[str, Any] = {
        "embed": P(None, None),
        "dense_blocks": deepseek_pipeline_block_specs(cfg),
        "ln_final": P(None),
    }
    for k, v in params.items():
        if k not in specs:
            specs[k] = P(*([None] * np.ndim(v)))
    return jax.tree.map(
        lambda spec, leaf: jax.device_put(leaf, NamedSharding(mesh, spec)),
        specs, params, is_leaf=lambda x: isinstance(x, P))


def _tp_mla_block(x, bp, cfg: DeepseekConfig, dt, tp: int, cos, sin):
    """One dense-MLP MLA block on LOCAL tensor-parallel shards.

    x is replicated over 'model'. q (or q_a->q_b) and kv_b are
    column-sharded, so this shard computes nq/tp heads end to end; kv_a is
    replicated — every shard derives the SAME c_norm/k_rot latent and
    expands only its own head group (the megatron dataflow transposed onto
    MLA's factored projections). o and down are row-sharded with explicit
    psum. cos/sin are rope tables at the microbatch's (full-sequence)
    positions.
    """
    b, s, _ = x.shape
    nq_l = cfg.num_heads // tp
    scale = mla_softmax_scale(cfg)

    h = _rms(x, bp["ln1"], cfg.rms_eps)
    if cfg.q_lora_rank is None:
        q = _mm(h, bp, "q_kernel", dt)
    else:
        qa = _rms(_mm(h, bp, "q_a_kernel", dt), bp["q_a_norm"], cfg.rms_eps)
        q = _mm(qa, bp, "q_b_kernel", dt)
    q = q.reshape(b, s, nq_l, cfg.qk_head_dim).transpose(0, 2, 1, 3)
    q_nope, q_rot = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)

    ckv = _mm(h, bp, "kv_a_kernel", dt)
    c, k_rot_raw = jnp.split(ckv, [cfg.kv_lora_rank], axis=-1)
    c_norm = _rms(c, bp["kv_a_norm"], cfg.rms_eps)
    kv = _mm(c_norm, bp, "kv_b_kernel", dt).reshape(
        b, s, nq_l, cfg.qk_nope_head_dim + cfg.v_head_dim
    ).transpose(0, 2, 1, 3)
    k_nope, v = jnp.split(kv, [cfg.qk_nope_head_dim], axis=-1)

    q_rot = _apply_rope(q_rot, cos[None, None], sin[None, None],
                        cfg.rope_interleave)
    k_rot = _apply_rope(k_rot_raw, cos[None], sin[None], cfg.rope_interleave)

    scores = (jnp.einsum("bhqn,bhkn->bhqk", q_nope, k_nope,
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bhqr,bkr->bhqk", q_rot, k_rot,
                           preferred_element_type=jnp.float32)) * scale
    pos = jnp.arange(s)
    scores = jnp.where((pos[None, :] <= pos[:, None])[None, None],
                       scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkv->bhqv", probs.astype(dt), v,
                     preferred_element_type=jnp.float32).astype(dt)
    out = ctx.transpose(0, 2, 1, 3).reshape(b, s, nq_l * cfg.v_head_dim)
    x = x + lax.psum(_mm(out, bp, "o_kernel", dt), "model")

    h2 = _rms(x, bp["ln2"], cfg.rms_eps)
    g = _mm(h2, bp, "gate_kernel", dt)
    u = _mm(h2, bp, "up_kernel", dt)
    return x + lax.psum(_mm(jax.nn.silu(g) * u, bp, "down_kernel", dt),
                        "model")


def make_deepseek_pipeline_forward(mesh: Mesh, cfg: DeepseekConfig, *,
                                   num_microbatches: int,
                                   compute_dtype=jnp.float32):
    """Build ``forward(params, tokens[b, s]) -> logits[b, s, V] (f32)`` on a
    (data, pipe, model) mesh — the GPipe fill/drain schedule of
    parallel/pipeline.make_pipeline_forward applied to dense-MLP MLA
    blocks. Differentiable (ppermute/psum transpose exactly), so
    :func:`make_deepseek_pipeline_train_step` reuses it."""
    n_pipe = mesh.shape["pipe"]
    tp = mesh.shape["model"]
    if cfg.n_moe_layers:
        raise ValueError(
            "the MLA pipeline covers dense-MLP DeepSeek configs "
            "(first_k_dense_replace == num_layers); routed experts run "
            "expert-parallel (parallel/llm_sharding.py MLA tp specs shard "
            "the expert axis) — an [E, d, f] expert einsum does not "
            "decompose along a pipe stage's layer scan")
    if cfg.num_layers % n_pipe:
        raise ValueError(f"num_layers {cfg.num_layers} % pipe {n_pipe} != 0")
    if cfg.num_heads % tp:
        raise ValueError(f"num_heads {cfg.num_heads} % model {tp} != 0")
    if cfg.effective_intermediate % tp:
        raise ValueError(f"intermediate {cfg.effective_intermediate} % "
                         f"model {tp} != 0")
    M = num_microbatches
    dt = compute_dtype

    def sched(blocks, embed, tokens_mb):
        p = lax.axis_index("pipe")
        mb, s = tokens_mb.shape[1], tokens_mb.shape[2]
        emb = embed.astype(dt)
        cos, sin = _rope_tables(cfg, jnp.arange(s))

        def stage(xx):
            def body(xx, bp):
                return _tp_mla_block(xx, bp, cfg, dt, tp, cos, sin), None
            xx, _ = lax.scan(body, xx, blocks)
            return xx

        state = jnp.zeros((mb, s, cfg.hidden_size), dt)
        outputs = jnp.zeros((M, mb, s, cfg.hidden_size), dt)

        def step(carry, t):
            state, outputs = carry
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
        return lax.psum(outputs, "pipe")

    mapped = jax.shard_map(
        sched, mesh=mesh,
        in_specs=(deepseek_pipeline_block_specs(cfg), P(None, None),
                  P(None, "data", None)),
        out_specs=P(None, "data", None, None),
        check_vma=False,
    )

    def forward(params: Params, tokens: jax.Array) -> jax.Array:
        b, s = tokens.shape
        if b % M:
            raise ValueError(f"batch {b} % num_microbatches {M} != 0")
        tokens_mb = tokens.reshape(M, b // M, s)
        hidden = mapped(params["dense_blocks"], params["embed"], tokens_mb)
        hidden = hidden.reshape(b, s, cfg.hidden_size)
        x = _rms(hidden, params["ln_final"], cfg.rms_eps)
        return _head_logits(x, params, dt)

    return forward


def make_deepseek_pipeline_train_step(mesh: Mesh, cfg: DeepseekConfig,
                                      optimizer, *, num_microbatches: int,
                                      compute_dtype=jnp.float32):
    """Jitted ``(params, opt_state, tokens) -> (params, opt_state, loss)``
    through the pipelined MLA forward (cf.
    parallel/pipeline.make_pipeline_train_step)."""
    import optax

    fwd = make_deepseek_pipeline_forward(
        mesh, cfg, num_microbatches=num_microbatches,
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
