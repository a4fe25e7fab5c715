"""Tensor/data-parallel sharding rules for the LLM path.

Replaces the reference's accelerate ``device_map="auto"`` layer placement for
7B models (src/utilities.py:48, src/slicegpt_utils/gpu_utils.py:70-91) with
GSPMD sharding over the (data, model) mesh: megatron-style column-parallel
QKV/gate/up, row-parallel o/down (XLA inserts the psum), sharded lm_head, and
batch data-parallelism for calibration/eval windows. A v5e-8 mesh holds
Llama-2-7B in bf16 comfortably (13 GB over 8 chips TP, or 2x replicas at
dp=2 x tp=4).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params


def llama_param_specs(cfg: LlamaConfig) -> Dict[str, Any]:
    """PartitionSpec pytree for the DENSE llama layout — derived from the
    same _block_key_spec rules that shard_llama_params applies to the actual
    pytree, so it can never drift from them. Prefer llm_param_specs_like
    (structure-driven) for anything pruned/quantized/packed."""
    names = ["ln1", "q_kernel", "k_kernel", "v_kernel", "o_kernel",
             "ln2", "gate_kernel", "up_kernel", "down_kernel"]
    if cfg.qkv_bias:
        names += ["q_bias", "k_bias", "v_bias"]
    if cfg.qk_norm:
        # per-head-DIM scales: head_dim is never sharded -> replicated
        names += ["q_norm", "k_norm"]
    blocks = {n: _block_key_spec(n, 3 if n.endswith("_kernel") else 2)
              for n in names}
    specs: Dict[str, Any] = {
        "embed": _top_key_spec("embed", 2),
        "blocks": blocks,
        "ln_final": _top_key_spec("ln_final", 1),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = _top_key_spec("lm_head", 2)
    return specs


# Megatron split: column-parallel producers of the head/intermediate dim,
# row-parallel consumers (their sharded-contraction output psums back).
_COL = frozenset({"q_kernel", "k_kernel", "v_kernel", "gate_kernel",
                  "up_kernel", "fc1_kernel",
                  # serve.pack_llm_params_for_serving fused names: both are
                  # output-dim concatenations of column-parallel kernels
                  "qkv_kernel", "gateup_kernel"})
_ROW = frozenset({"o_kernel", "down_kernel", "fc2_kernel"})
_COL_BIAS = frozenset({"q_bias", "k_bias", "v_bias", "fc1_bias"})


def _block_key_spec(key: str, ndim: int):
    """PartitionSpec for one stacked block-param leaf, including the
    quantized-name variants (<k>_q int8, <k>_q4 packed int4, <k>_scale).

    int4 + row-parallel is the one unsupported combination: the split-half
    nibble packing interleaves global K rows, so sharding the packed K axis
    would pair rows from different shards — those weights stay replicated
    (correct, XLA all-gathers their sharded input; memory-suboptimal)."""
    base, kind = key, "plain"
    if key.endswith("_q4"):
        base, kind = key[:-3], "q4"
    elif key.endswith("_q"):
        base, kind = key[:-2], "q"
    elif key.endswith("_scale"):
        base, kind = key[:-6], "scale"
    if base in _COL:
        if kind == "scale":
            return P(*([None] * (ndim - 1)), "model")
        # last axis is the column/output dim for both dense [L, d, f] and
        # MoE expert-stacked [L, E, d, f] kernels
        return P(*([None] * (ndim - 1)), "model")
    if base in _ROW:
        if kind == "q4":
            return P(*([None] * ndim))
        if kind == "scale":
            return P(*([None] * ndim))
        # second-to-last axis is the contracting/row dim for dense
        # [L, f, d] and MoE [L, E, f, d] kernels (sharded contraction psums)
        return P(*([None] * (ndim - 2)), "model", None)
    if base in _COL_BIAS:
        return P(None, "model")
    return P(*([None] * ndim))  # norms, o/fc2 bias, anything replicated


def _top_key_spec(key: str, ndim: int):
    if key in ("lm_head", "lm_head_q"):
        return P(None, "model")
    if key in ("lm_head_scale", "lm_head_bias"):
        return P("model")
    return P(*([None] * ndim))


def llm_param_specs_like(params: Params) -> Dict[str, Any]:
    """Spec pytree built from the ACTUAL param structure — covers dense,
    2SSP-materialized, phi/OPT layouts and int8/int4-quantized pytrees."""
    specs: Dict[str, Any] = {}
    for k, v in params.items():
        if k == "blocks":
            specs["blocks"] = {bk: _block_key_spec(bk, bv.ndim)
                               for bk, bv in v.items()}
        else:
            specs[k] = _top_key_spec(k, v.ndim)
    return specs


def _place_by_specs(params: Params, specs, mesh: Mesh) -> Params:
    """device_put every leaf to its NamedSharding(mesh, spec)."""
    return jax.tree.map(
        lambda spec, leaf: jax.device_put(leaf, NamedSharding(mesh, spec)),
        specs, params, is_leaf=lambda x: isinstance(x, P))


def shard_llama_params(params: Params, mesh: Mesh, cfg: LlamaConfig) -> Params:
    return _place_by_specs(params, llm_param_specs_like(params), mesh)


# ---------------- tensor-parallel serving ----------------

def shard_llm_cache(mesh: Mesh, cache):
    """Shard a serve.init_cache product over KV heads ('model' axis).
    Handles both bf16 arrays [A, b, len, nkv, hd] and int8 cache pytrees
    ({"q": 5-d codes, "s": 4-d scales})."""
    def put(x):
        spec = (P(None, None, None, "model", None) if x.ndim == 5
                else P(None, None, None, "model"))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, cache)


def tp_cache_factory(mesh: Mesh):
    """serve.init_cache-compatible factory placing caches head-sharded; pass
    as ``generate_kv_scan(..., cache_factory=tp_cache_factory(mesh))``."""
    from ssp_x_vit_tpu.llm.serve import init_cache

    def factory(cfg, batch, max_len, dtype):
        if cfg.num_kv_heads % mesh.shape["model"]:
            raise ValueError(
                f"num_kv_heads {cfg.num_kv_heads} not divisible by model-axis "
                f"size {mesh.shape['model']}")
        ck, cv = init_cache(cfg, batch, max_len, dtype)
        return shard_llm_cache(mesh, ck), shard_llm_cache(mesh, cv)

    return factory


def tp_generate_kv_scan(params: Params, cfg: LlamaConfig, mesh: Mesh,
                        input_ids, **kw):
    """Tensor-parallel serving: megatron-sharded params (shard_llama_params)
    + head-sharded KV cache; attention is head-local, the o/down row-parallel
    matmuls psum over ICI, logits are vocab-sharded. One code path with
    single-chip serving — GSPMD compiles the collectives from the shardings
    (serve.generate_kv_scan's jits follow their argument placements)."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    sharded = shard_llama_params(params, mesh, cfg)
    return generate_kv_scan(sharded, cfg, input_ids,
                            cache_factory=tp_cache_factory(mesh), **kw)


def sharded_window_nll_fn(mesh: Mesh, cfg: LlamaConfig):
    """jitted (params, tokens[b, s]) -> per-window NLL sums [b] (each over
    the window's seq_len - 1 predicted tokens), batch over 'data' with
    tensor-parallel params; evaluate_perplexity_sharded does the counting."""
    import functools

    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.model import llama_forward

    token_sharding = NamedSharding(mesh, P("data", None))

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def window_nll(params, tokens, cfg: LlamaConfig):
        logits, _ = llama_forward(params, tokens, cfg)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
        return jnp.sum(nll, axis=1)  # per-window NLL sums [b]

    def run(params, tokens):
        tokens = jax.device_put(jnp.asarray(tokens, jnp.int32), token_sharding)
        return window_nll(params, tokens, cfg)

    return run


def evaluate_perplexity_sharded(params, cfg: LlamaConfig, mesh: Mesh,
                                input_ids, *, seq_len: int = 2048) -> float:
    """Data+tensor-parallel perplexity: windows batched over the 'data' axis
    (the TPU-native replacement for the reference's single-GPU streaming loop,
    src/evaluation.py:24-64 — identical estimator)."""
    ids = np.asarray(input_ids).reshape(-1)
    num_windows = ids.size // seq_len
    if num_windows == 0:
        raise ValueError(
            f"input has {ids.size} tokens < seq_len {seq_len}: no full "
            "window to evaluate (a silent ppl=1.0 would corrupt comparisons)")
    dp = mesh.shape["data"]
    windows = ids[: num_windows * seq_len].reshape(num_windows, seq_len)
    # pad window count to a multiple of dp with repeats, masking extras out
    pad = (-num_windows) % dp
    if pad:
        windows = np.concatenate([windows, np.tile(windows[-1:], (pad, 1))])
    run = sharded_window_nll_fn(mesh, cfg)

    total, count = 0.0, 0
    for i in range(0, len(windows), dp):
        valid = min(dp, num_windows - i)
        per_window = np.asarray(run(params, windows[i : i + dp]))  # [dp]
        total += float(per_window[:valid].sum())
        count += valid * (seq_len - 1)
    return float(np.exp(total / max(1, count)))


def make_sharded_llama_train_step(mesh: Mesh, cfg: LlamaConfig, optimizer=None,
                                  *, compute_dtype=None, remat: bool = True):
    """dp x tp training step: ``step(params, opt_state, tokens) ->
    (params, opt_state, loss)``.

    Params (and therefore grads and adamw moments, which jit places like the
    params they mirror) are megatron-sharded over 'model'
    (shard_llama_params); tokens shard over 'data'. GSPMD inserts the
    column/row-parallel psums and the grad all-reduce over 'data' from the
    shardings — no hand-written collectives (the pipelined alternative with
    explicit ppermute/psum lives in parallel/pipeline.py). The single-chip
    hot path is reused verbatim: flash fwd + pallas bwd kernels and
    per-layer remat (llm/train.py). Call with params already placed via
    shard_llama_params; opt_state from optimizer.init(sharded_params)
    inherits the placement.
    """
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.train import make_llama_train_step

    compute_dtype = compute_dtype or jnp.bfloat16
    token_sharding = NamedSharding(mesh, P("data", None))
    # The jitted step IS the single-chip one — GSPMD turns the same program
    # multi-chip purely from the argument placements.
    step = make_llama_train_step(cfg, optimizer, compute_dtype=compute_dtype,
                                 remat=remat)

    def run(params, opt_state, tokens):
        tokens = jax.device_put(jnp.asarray(tokens, jnp.int32), token_sharding)
        return step(params, opt_state, tokens)

    return run


# ---------------- FSDP (ZeRO-3-style) training ----------------

def fsdp_llama_param_specs_like(params: Params, dp: int) -> Dict[str, Any]:
    """Fully-sharded specs: each leaf shards its largest dp-divisible WEIGHT
    axis over 'data' (for stacked block leaves the layer axis 0 is excluded —
    sharding whole layers would serialize the scan's gathers). Params,
    grads and optimizer moments all inherit this placement, so per-chip
    memory for state is ~1/dp; XLA all-gathers each layer's weights at use
    and reduce-scatters its grads (the scaling-book fsdp recipe, derived
    entirely from the shardings). Leaves with no divisible axis (norm
    scales, odd shapes) stay replicated — correct, just unsharded.

    Shape-driven, so it covers every stacked-block pytree: llama-family
    ("blocks") and DeepSeek/MLA ("dense_blocks"/"moe_blocks") — any
    dict-valued top-level entry is treated as a stacked group whose layer
    axis 0 is excluded from sharding."""
    def leaf_spec(v, start_axis):
        cands = [(s, i) for i, s in enumerate(v.shape)
                 if i >= start_axis and s % dp == 0]
        if not cands:
            return P(*([None] * v.ndim))
        _, ax = max(cands)
        spec = [None] * v.ndim
        spec[ax] = "data"
        return P(*spec)

    specs: Dict[str, Any] = {}
    for k, v in params.items():
        if isinstance(v, dict):
            specs[k] = {bk: leaf_spec(bv, 1) for bk, bv in v.items()}
        else:
            specs[k] = leaf_spec(v, 0)
    return specs


def shard_llama_params_fsdp(params: Params, mesh: Mesh) -> Params:
    if mesh.shape.get("model", 1) != 1:
        raise ValueError(
            "FSDP shards over 'data' only and its in-step constraints would "
            "silently drop a megatron 'model' placement — use a model=1 mesh "
            "(fsdp x tp composition is future work; dp x tp lives in "
            "make_sharded_llama_train_step)")
    return _place_by_specs(
        params, fsdp_llama_param_specs_like(params, mesh.shape["data"]), mesh)


def make_fsdp_llama_train_step(mesh: Mesh, cfg: LlamaConfig, optimizer=None,
                               *, compute_dtype=None, remat: bool = True):
    """FSDP training step: ``step(params, opt_state, tokens)`` where params
    came through shard_llama_params_fsdp and opt_state =
    optimizer.init(sharded_params). The loss/step body is the single-chip
    one (flash fwd + pallas bwd, per-layer remat); updated params are
    re-constrained to the fsdp specs so the placement is a guarantee, not a
    propagation accident. Requires a model=1 mesh: the fsdp constraints
    mention only 'data', so they would silently REPLICATE a megatron
    'model' placement (fsdp x tp composition is future work; dp x tp is
    make_sharded_llama_train_step).

    ``cfg`` may be a DeepseekConfig: next_token_loss dispatches to the MLA
    engine and the e_score_correction_bias update is zeroed
    (llm/train._freeze_buffers), same as the single-chip train steps."""
    import functools

    import jax.numpy as jnp
    import optax

    from ssp_x_vit_tpu.llm.train import _freeze_buffers, next_token_loss

    if mesh.shape.get("model", 1) != 1:
        raise ValueError("FSDP step requires a model=1 mesh (see "
                         "shard_llama_params_fsdp)")
    if optimizer is None:
        optimizer = optax.adamw(1e-4)
    compute_dtype = compute_dtype or jnp.bfloat16
    token_sharding = NamedSharding(mesh, P("data", None))

    def constrain(params):
        specs = fsdp_llama_param_specs_like(params, mesh.shape["data"])
        return jax.tree.map(
            lambda sp, x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, sp)),
            specs, params, is_leaf=lambda x: isinstance(x, P))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(next_token_loss)(
            params, tokens, cfg, compute_dtype=compute_dtype, remat=remat)
        grads = constrain(grads)  # reduce-scatter, not all-reduce
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = _freeze_buffers(updates, cfg)
        params = constrain(optax.apply_updates(params, updates))
        return params, opt_state, loss

    def run(params, opt_state, tokens):
        tokens = jax.device_put(jnp.asarray(tokens, jnp.int32), token_sharding)
        return step(params, opt_state, tokens)

    return run


# ---------------- MoE-llama expert-parallel placement ----------------

def moe_llama_param_specs_like(params: Params) -> Dict[str, Any]:
    """Specs for a MoE-llama pytree (LlamaConfig.num_experts > 0): the
    expert axis of the stacked per-layer expert kernels [L, E, ...] shards
    over 'expert'; everything else (attention, norms, router, embeddings)
    replicates. The integrated forward is the DROPLESS path
    (moe_ffn_dropless): GSPMD shards its [T, E, f] all-expert intermediates
    over 'expert' from the weight placement and psums the gate-combined
    output over E. (Tensor parallelism for MoE instead rides
    shard_llama_params, whose ndim-aware megatron specs shard the expert
    kernels' f axis over 'model'.)"""
    moe_keys = {"gate_kernel", "up_kernel", "down_kernel"}

    def base(bk):  # strip quantized-name suffixes (_q int8 / _q4 / _scale)
        for suf in ("_q4", "_q", "_scale"):
            if bk.endswith(suf):
                return bk[: -len(suf)]
        return bk

    specs: Dict[str, Any] = {}
    for k, v in params.items():
        if k == "blocks":
            specs["blocks"] = {
                bk: (P(None, "expert", *([None] * (bv.ndim - 2)))
                     if base(bk) in moe_keys and bv.ndim >= 3
                     else P(*([None] * bv.ndim)))
                for bk, bv in v.items()
            }
        else:
            specs[k] = P(*([None] * v.ndim))
    return specs


def shard_moe_llama_params(params: Params, mesh: Mesh) -> Params:
    return _place_by_specs(params, moe_llama_param_specs_like(params), mesh)


# ---------------- DeepSeek / MLA tensor parallelism ----------------

# head-major output-dim kernels (column-parallel: sharding the last axis by
# equal parts == contiguous head groups, since the layout is (head, dim)
# pairs) and their row-parallel consumers
_DS_COL = frozenset({"q_kernel", "q_b_kernel", "kv_b_kernel",
                     "gate_kernel", "up_kernel", "shared_gate", "shared_up"})
_DS_ROW = frozenset({"o_kernel", "down_kernel", "shared_down"})


def deepseek_param_specs_like(params: Params) -> Dict[str, Any]:
    """Megatron-for-MLA specs for the DeepSeek pytree (llm/deepseek.py):

    - column-parallel q/q_b/kv_b (head-major output dims) and dense-FFN /
      shared-expert gate/up; row-parallel o/down (sharded contraction
      psums);
    - routed-expert kernels [L, E, d, f] shard the EXPERT axis — the
      dropless einsums' [T, E, f] intermediates shard over E from the
      weight placement alone, and the gate-combine contraction over E
      psums (cf. moe_llama_param_specs_like);
    - the low-rank a-projections (q_a, kv_a), norms, router, and
      e_score_correction_bias replicate (tiny, head-independent).

    The payoff is MLA-specific: the compressed latent cache derives from
    the REPLICATED kv_a projection, so it replicates under tp — no
    head-sharded cache to manage — while every per-head matmul of the
    absorbed decode (q, q_nope @ W_k, scores, context re-expansion, o)
    shards cleanly over heads."""
    def block_spec(k, ndim):
        if ndim == 4:                       # expert-stacked [L, E, d, f]
            return P(None, "model", None, None)
        if k in _DS_COL:
            return P(None, None, "model")
        if k in _DS_ROW:
            return P(None, "model", None)
        return P(*([None] * ndim))

    specs: Dict[str, Any] = {}
    for k, v in params.items():
        if k in ("dense_blocks", "moe_blocks"):
            specs[k] = {bk: block_spec(bk, bv.ndim) for bk, bv in v.items()}
        else:
            specs[k] = _top_key_spec(k, v.ndim)
    return specs


def shard_deepseek_params(params: Params, mesh: Mesh, cfg) -> Params:
    """Place a DeepSeek pytree tensor-parallel over mesh axis 'model'.
    deepseek_generate / deepseek_forward then run tensor-parallel with no
    code changes — GSPMD compiles the collectives from the placements."""
    tp = mesh.shape["model"]
    if cfg.num_heads % tp:
        raise ValueError(f"num_heads {cfg.num_heads} not divisible by "
                         f"model-axis size {tp}")
    if cfg.n_routed_experts and cfg.n_routed_experts % tp:
        raise ValueError(f"n_routed_experts {cfg.n_routed_experts} not "
                         f"divisible by model-axis size {tp}")
    if cfg.vocab_size % tp:
        raise ValueError(f"vocab_size {cfg.vocab_size} not divisible by "
                         f"model-axis size {tp}")
    if cfg.n_dense_layers and cfg.intermediate_size % tp:
        raise ValueError(f"intermediate_size {cfg.intermediate_size} not "
                         f"divisible by model-axis size {tp}")
    if cfg.n_moe_layers and cfg.n_shared_experts and \
            (cfg.moe_intermediate_size * cfg.n_shared_experts) % tp:
        raise ValueError("shared-expert width not divisible by model axis")
    return _place_by_specs(params, deepseek_param_specs_like(params), mesh)
