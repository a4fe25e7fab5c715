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
                             num_microbatches: int, compute_dtype=jnp.float32):
    """Jitted ``(params, opt_state, tokens) -> (params, opt_state, loss)``:
    next-token NLL through the pipelined forward (ppermute/psum transpose
    exactly, so gradients flow through the schedule)."""
    import optax

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


def make_pipeline_mesh(data: int = 1, pipe: int = 2, model: int = 1,
                       devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * pipe * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(data, pipe, model),
                ("data", "pipe", "model"))
