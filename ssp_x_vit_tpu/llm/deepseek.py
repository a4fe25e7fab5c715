"""DeepSeek-V3 family: Multi-head Latent Attention (MLA) + sigmoid-routed MoE.

The reference framework tops out at the Llama-2/Mistral/Qwen2/Phi generation
(``/root/reference/src/slicegpt.py:16-31``); this module covers the MLA
architecture class (DeepSeek-V2/V3, the current frontier of KV-efficient
serving) natively, as its own engine — the MLA cache is *structurally*
different from the per-head K/V caches of ``llm/serve.py``:

- **MLA**: queries/keys live in ``qk_nope + qk_rope`` dims; the KV path is
  low-rank — ``kv_a_proj`` compresses the hidden state to ``kv_lora_rank``
  (+ a SINGLE shared rope key of ``qk_rope_head_dim``), and ``kv_b_proj``
  re-expands per head. The serving cache stores only the compressed vector
  and the shared rope key: **(kv_lora_rank + qk_rope_head_dim) floats per
  token, shared by ALL heads** (DeepSeek-V3: 512+64 vs 2*128*128 for an
  equivalent MHA — a 57x cache reduction).
- **Absorbed decode** (the MLA trick, DeepSeek-V2 paper §2.1.2): at decode
  time ``kv_b``'s key half is folded into the query (``q_nope @ W_k^T`` maps
  each head's query into the compressed space) and its value half into the
  output, so attention runs DIRECTLY against the compressed cache — per
  step the cache traffic is rank-sized and head-independent, turning MHA
  arithmetic into MQA-like bandwidth. Exact by linearity (tested against
  the full-recompute forward).
- **MoE**: sigmoid router scores + ``e_score_correction_bias`` for
  selection, group-limited top-k (``n_group``/``topk_group``), weights
  gathered from the UN-biased scores, optional renormalization,
  ``routed_scaling_factor``, plus always-on shared experts; the first
  ``first_k_dense_replace`` layers use a dense GLU MLP. Layers scan in two
  homogeneous groups (dense prefix, MoE suffix) — XLA-friendly, no ragged
  per-layer params.

HF parity: logits match ``transformers`` ``DeepseekV3ForCausalLM``
(tests/test_deepseek.py); checkpoints load via :func:`load_hf_deepseek`.
``rope_scaling`` supports deepseek-style YaRN (mscale/mscale_all_dim): the
cos/sin tables carry the mscale-ratio attention factor (llm/rope.py) and the
softmax scale is multiplied by ``yarn_get_mscale(factor, mscale_all_dim)**2``
(:func:`mla_softmax_scale`), matching HF ``DeepseekV3Attention.__init__``.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.rope import (RopeScaling, parse_rope_scaling,
                                    rope_freqs, yarn_get_mscale)

Params = Dict[str, Any]

__all__ = ["DeepseekConfig", "init_deepseek_params", "deepseek_forward",
           "deepseek_forward_materialized",
           "load_hf_deepseek", "config_from_hf_deepseek",
           "deepseek_generate", "mla_cache_bytes_per_token",
           "mla_softmax_scale", "export_hf_deepseek", "hf_dict_from_deepseek",
           "save_deepseek_model", "load_deepseek_model"]


@dataclasses.dataclass(frozen=True)
class DeepseekConfig:
    vocab_size: int = 129280
    hidden_size: int = 7168
    num_layers: int = 4
    num_heads: int = 16
    # MLA dims (HF DeepseekV3Config names on the right)
    q_lora_rank: Optional[int] = None     # q_lora_rank (None = direct q_proj)
    kv_lora_rank: int = 512               # kv_lora_rank
    qk_nope_head_dim: int = 128           # qk_nope_head_dim
    qk_rope_head_dim: int = 64            # qk_rope_head_dim
    v_head_dim: int = 128                 # v_head_dim
    rope_interleave: bool = True          # rope_interleave
    # MLPs
    intermediate_size: int = 18432        # dense layers
    moe_intermediate_size: int = 2048     # per routed/shared expert
    n_routed_experts: int = 0             # 0 = every layer dense
    n_shared_experts: int = 1
    num_experts_per_tok: int = 8
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    first_k_dense_replace: int = 0
    hidden_act: str = "silu"
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None  # frozen/hashable, rides jit
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    # pruning surgery state (cf. LlamaConfig): uniform stage-1 FFN width on
    # the dense blocks, and globally-indexed attention submodules physically
    # removed by materialize_deepseek_attention_pruning
    pruned_intermediate_size: Optional[int] = None
    pruned_attention_blocks: Tuple[int, ...] = ()

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def effective_intermediate(self) -> int:
        return (self.pruned_intermediate_size
                if self.pruned_intermediate_size is not None
                else self.intermediate_size)

    @property
    def attn_store_index(self):
        """Global layer index -> index into the layer's GROUP attention
        stacks (compacted past removed attention submodules), or None when
        this block's attention was pruned. Each group (dense prefix, MoE
        suffix) compacts independently — their stacks are separate pytrees."""
        out, nk = [], self.n_dense_layers
        counts = {False: 0, True: 0}
        for i in range(self.num_layers):
            grp = i >= nk
            if i in self.pruned_attention_blocks:
                out.append(None)
            else:
                out.append(counts[grp])
                counts[grp] += 1
        return out

    @property
    def n_dense_layers(self) -> int:
        if self.n_routed_experts == 0:
            return self.num_layers
        return min(self.first_k_dense_replace, self.num_layers)

    @property
    def n_moe_layers(self) -> int:
        return self.num_layers - self.n_dense_layers

    def __post_init__(self):
        if self.hidden_act != "silu":
            raise ValueError("deepseek engine supports silu GLU only")
        if not isinstance(self.pruned_attention_blocks, tuple):
            # JSON round-trips (load_deepseek_model) hand back lists; the
            # config must stay hashable (it rides jit as a static arg)
            object.__setattr__(self, "pruned_attention_blocks",
                               tuple(int(i) for i in self.pruned_attention_blocks))
        if self.n_routed_experts and self.topk_group > self.n_group:
            raise ValueError("topk_group must be <= n_group")
        if self.n_routed_experts and self.n_routed_experts % max(self.n_group, 1):
            raise ValueError("n_routed_experts must divide into n_group groups")


def mla_cache_bytes_per_token(cfg: DeepseekConfig, dtype_bytes: int = 2) -> int:
    """Serving-cache footprint per token per layer: compressed vector + the
    single shared rope key (head-count independent — the MLA selling point)."""
    return (cfg.kv_lora_rank + cfg.qk_rope_head_dim) * dtype_bytes


# --------------------------------------------------------------------------
# params
# --------------------------------------------------------------------------

def _attn_param_shapes(cfg: DeepseekConfig):
    d, nq = cfg.hidden_size, cfg.num_heads
    shapes = {
        "ln1": (d,),
        "kv_a_kernel": (d, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
        "kv_a_norm": (cfg.kv_lora_rank,),
        "kv_b_kernel": (cfg.kv_lora_rank,
                        nq * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
        "o_kernel": (nq * cfg.v_head_dim, d),
        "ln2": (d,),
    }
    if cfg.q_lora_rank is None:
        shapes["q_kernel"] = (d, nq * cfg.qk_head_dim)
    else:
        shapes["q_a_kernel"] = (d, cfg.q_lora_rank)
        shapes["q_a_norm"] = (cfg.q_lora_rank,)
        shapes["q_b_kernel"] = (cfg.q_lora_rank, nq * cfg.qk_head_dim)
    return shapes


def init_deepseek_params(rng: jax.Array, cfg: DeepseekConfig,
                         dtype=jnp.float32) -> Params:
    if cfg.pruned_attention_blocks:
        raise ValueError("init builds uniform stacks; materialize attention "
                         "pruning from an unpruned model instead")
    d, fm, E = cfg.hidden_size, cfg.moe_intermediate_size, cfg.n_routed_experts
    keys = iter(jax.random.split(rng, 64))

    def nrm(shape, std=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * std).astype(dtype)

    def ones(shape):
        return jnp.ones(shape, dtype)

    def stack_group(n, moe: bool):
        shapes = _attn_param_shapes(cfg)
        blocks = {}
        for k, shp in shapes.items():
            if k.endswith("norm") or k.startswith("ln"):
                blocks[k] = ones((n,) + shp)
            else:
                blocks[k] = nrm((n,) + shp)
        if moe:
            blocks["router"] = nrm((n, d, E))
            blocks["e_bias"] = jnp.zeros((n, E), dtype)
            blocks["gate_kernel"] = nrm((n, E, d, fm))
            blocks["up_kernel"] = nrm((n, E, d, fm))
            blocks["down_kernel"] = nrm((n, E, fm, d))
            if cfg.n_shared_experts:
                fs = fm * cfg.n_shared_experts
                blocks["shared_gate"] = nrm((n, d, fs))
                blocks["shared_up"] = nrm((n, d, fs))
                blocks["shared_down"] = nrm((n, fs, d))
        else:
            f = cfg.effective_intermediate
            blocks["gate_kernel"] = nrm((n, d, f))
            blocks["up_kernel"] = nrm((n, d, f))
            blocks["down_kernel"] = nrm((n, f, d))
        return blocks

    params: Params = {"embed": nrm((cfg.vocab_size, d)),
                      "ln_final": ones((d,))}
    if cfg.n_dense_layers:
        params["dense_blocks"] = stack_group(cfg.n_dense_layers, moe=False)
    if cfg.n_moe_layers:
        params["moe_blocks"] = stack_group(cfg.n_moe_layers, moe=True)
    if not cfg.tie_embeddings:
        params["lm_head"] = nrm((d, cfg.vocab_size))
    return params


# --------------------------------------------------------------------------
# norms / rope
# --------------------------------------------------------------------------

def _rms(x, scale, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _rope_tables(cfg: DeepseekConfig, positions: jax.Array):
    """cos/sin [*pos_shape, rope_dim] for given integer positions, HF
    non-interleaved table layout (freqs duplicated across halves); under
    yarn the tables carry the attention factor (mscale ratio), matching
    transformers rotary embeddings."""
    inv_freq_np, attn_scale = rope_freqs(cfg.rope_theta,
                                         cfg.qk_rope_head_dim,
                                         cfg.rope_scaling)
    inv_freq = jnp.asarray(inv_freq_np)                       # [rd/2]
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)            # [..., rd]
    return jnp.cos(emb) * attn_scale, jnp.sin(emb) * attn_scale


def mla_softmax_scale(cfg: DeepseekConfig) -> float:
    """HF ``DeepseekV3Attention.__init__``: the softmax scale is
    ``qk_head_dim**-0.5``, multiplied by ``yarn_get_mscale(factor,
    mscale_all_dim)**2`` whenever rope_scaling carries a truthy
    ``mscale_all_dim`` (checked on presence, not rope_type — mirroring
    transformers exactly)."""
    scale = cfg.qk_head_dim ** -0.5
    sc = cfg.rope_scaling
    if sc is not None and sc.mscale_all_dim:
        m = yarn_get_mscale(sc.factor, sc.mscale_all_dim)
        scale *= m * m
    return scale


def _deinterleave(x):
    """HF rope_interleave: view [..., d/2, 2] -> transpose -> flatten, i.e.
    even lanes first, odd lanes second (checkpoints store interleaved
    rotary pairs)."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


def _apply_rope(x, cos, sin, interleave: bool):
    """x [..., rd]; cos/sin broadcastable [..., rd]."""
    if interleave:
        x = _deinterleave(x)
    x32 = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x32[..., half:], x32[..., :half]], axis=-1)
    return (x32 * cos + rot * sin).astype(x.dtype)


# --------------------------------------------------------------------------
# attention (full-sequence path)
# --------------------------------------------------------------------------

def _mm(x, bp, name, dt):
    """Quantization-aware projection matmul (ops.common.mm_quant): plain
    ``<name>`` kernels, int8 ``<name>_q`` + per-out-channel
    ``<name>_scale`` epilogues (llm/quant.quantize_deepseek_params_int8),
    one dispatch shared with the llama family's paths."""
    from ssp_x_vit_tpu.ops.common import mm_quant

    return mm_quant(x, bp, name, dt)


def _kv_b_matrix(bp, dt):
    """The [kvr, nq*(nope+vd)] kv_b weight AS A MATRIX — the absorbed
    decode folds it through per-head einsums rather than a single matmul,
    so int8 entries dequantize here (per-out-channel scale broadcast over
    the kvr rows; small: rank x heads*(nope+vd))."""
    if "kv_b_kernel_q" in bp:
        return (bp["kv_b_kernel_q"].astype(jnp.float32)
                * bp["kv_b_kernel_scale"].astype(jnp.float32)[None]).astype(dt)
    if "kv_b_kernel_q4" in bp:
        from ssp_x_vit_tpu.ops.pallas.quant_matmul import unpack_int4

        return (unpack_int4(bp["kv_b_kernel_q4"]).astype(jnp.float32)
                * bp["kv_b_kernel_scale"].astype(jnp.float32)[None]).astype(dt)
    return bp["kv_b_kernel"].astype(dt)


def _head_logits(x, params, dt):
    """Final lm_head projection -> f32 logits: tied-embed fallback, int8
    lm_head_q via _mm (one dispatch with the block projections)."""
    if "lm_head" in params or "lm_head_q" in params:
        return _mm(x, params, "lm_head", dt).astype(jnp.float32)
    return (x @ params["embed"].T.astype(dt)).astype(jnp.float32)


def _mla_q(x, bp, cfg: DeepseekConfig, dt):
    """[b, s, d] -> q [b, nq, s, qk_head_dim] (pre-rope)."""
    b, s, _ = x.shape
    if cfg.q_lora_rank is None:
        q = _mm(x, bp, "q_kernel", dt)
    else:
        qa = _rms(_mm(x, bp, "q_a_kernel", dt), bp["q_a_norm"], cfg.rms_eps)
        q = _mm(qa, bp, "q_b_kernel", dt)
    return q.reshape(b, s, cfg.num_heads, cfg.qk_head_dim).transpose(0, 2, 1, 3)


def _mla_compressed(x, bp, cfg: DeepseekConfig, dt):
    """[b, s, d] -> (c_norm [b, s, kvr], k_rot_raw [b, s, rd]). ``c_norm`` is
    the POST-kv_a_layernorm compressed vector — exactly what the serving
    cache stores (kv_b consumes the normalized vector)."""
    ckv = _mm(x, bp, "kv_a_kernel", dt)
    c, k_rot = jnp.split(ckv, [cfg.kv_lora_rank], axis=-1)
    return _rms(c, bp["kv_a_norm"], cfg.rms_eps), k_rot


def _mla_expand_kv(c_norm, bp, cfg: DeepseekConfig, dt):
    """compressed [b, s, kvr] -> (k_nope [b, nq, s, nope], v [b, nq, s, vd])."""
    b, s, _ = c_norm.shape
    kv = _mm(c_norm, bp, "kv_b_kernel", dt).reshape(
        b, s, cfg.num_heads, cfg.qk_nope_head_dim + cfg.v_head_dim
    ).transpose(0, 2, 1, 3)
    return jnp.split(kv, [cfg.qk_nope_head_dim], axis=-1)


def _mla_attention(x, bp, cfg: DeepseekConfig, dt):
    """Full-sequence causal MLA attention. Returns (out [b, s, d],
    c_norm [b, s, kvr], k_rot_roped [b, s, rd]) — the latter two feed the
    serving cache during prefill."""
    b, s, _ = x.shape
    q = _mla_q(x, bp, cfg, dt)
    q_nope, q_rot = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)
    c_norm, k_rot_raw = _mla_compressed(x, bp, cfg, dt)
    k_nope, v = _mla_expand_kv(c_norm, bp, cfg, dt)

    pos = jnp.arange(s)
    cos, sin = _rope_tables(cfg, pos)                         # [s, rd]
    q_rot = _apply_rope(q_rot, cos[None, None], sin[None, None],
                        cfg.rope_interleave)                  # [b, nq, s, rd]
    k_rot = _apply_rope(k_rot_raw, cos[None], sin[None],
                        cfg.rope_interleave)                  # [b, s, rd]

    scale = mla_softmax_scale(cfg)
    # compute-dtype operands with f32 MXU accumulation (softmax in f32):
    # exact at f32, and at bf16 the matmuls stream bf16 instead of paying
    # the 3-pass f32 MXU penalty (docs/tpu_notes.md matmul-precision note)
    scores = (jnp.einsum("bhqn,bhkn->bhqk", q_nope, k_nope,
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bhqr,bkr->bhqk", q_rot, k_rot,
                           preferred_element_type=jnp.float32)) * scale
    mask = pos[None, :] <= pos[:, None]                        # causal [s, s]
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkv->bhqv", probs.astype(dt), v,
                     preferred_element_type=jnp.float32).astype(dt)
    out = ctx.transpose(0, 2, 1, 3).reshape(b, s,
                                            cfg.num_heads * cfg.v_head_dim)
    return _mm(out, bp, "o_kernel", dt), c_norm, k_rot


# --------------------------------------------------------------------------
# MLPs
# --------------------------------------------------------------------------

def _glu(x, bp, dt, names=("gate_kernel", "up_kernel", "down_kernel")):
    """SwiGLU over named block params (quantization-aware via _mm);
    ``names`` selects the shared-expert triple in the MoE path."""
    g = _mm(x, bp, names[0], dt)
    u = _mm(x, bp, names[1], dt)
    return _mm(jax.nn.silu(g) * u, bp, names[2], dt)


def _deepseek_route(xt, bp, cfg: DeepseekConfig):
    """HF DeepseekV3TopkRouter: f32 sigmoid scores; selection on
    scores + e_score_correction_bias with group-limited top-k (top-2-sum
    group scores); WEIGHTS gathered from the un-biased scores; optional
    renorm; routed_scaling_factor. Returns dense [T, E] combine weights."""
    E, k = cfg.n_routed_experts, cfg.num_experts_per_tok
    logits = xt.astype(jnp.float32) @ bp["router"].astype(jnp.float32)
    scores = jax.nn.sigmoid(logits)                            # [T, E]
    choice = scores + bp["e_bias"].astype(jnp.float32)[None]
    if cfg.n_group > 1:
        T = choice.shape[0]
        per = E // cfg.n_group
        grouped = choice.reshape(T, cfg.n_group, per)
        top2, _ = jax.lax.top_k(grouped, min(2, per))
        group_scores = jnp.sum(top2, axis=-1)                  # [T, G]
        _, gidx = jax.lax.top_k(group_scores, cfg.topk_group)
        gmask = jnp.sum(jax.nn.one_hot(gidx, cfg.n_group), axis=1)  # [T, G]
        choice = jnp.where(
            jnp.repeat(gmask, per, axis=-1) > 0, choice, 0.0)
    _, top_e = jax.lax.top_k(choice, k)                        # [T, k]
    w = jnp.take_along_axis(scores, top_e, axis=1)             # un-biased
    if cfg.norm_topk_prob:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
    w = w * cfg.routed_scaling_factor
    return jnp.sum(jax.nn.one_hot(top_e, E, dtype=jnp.float32)
                   * w[..., None], axis=1)                     # [T, E]


def _deepseek_moe(x, bp, cfg: DeepseekConfig, dt):
    """Dropless routed experts + always-on shared experts."""
    b, s, d = x.shape
    xt = x.reshape(b * s, d)
    sel = _deepseek_route(xt, bp, cfg).astype(dt)              # [T, E]

    def expert_mm(spec, t, name):
        """einsum against bf16/f32, int8, OR packed-int4 expert kernels —
        per-(expert, out-channel) scales fold into the epilogue (cf.
        parallel/moe.py). int4 stacks unpack in-graph (split-half nibble
        layout, ops/pallas/quant_matmul.unpack_int4 over axis -2) so only
        half the bytes stream from HBM."""
        if name in bp:
            return jnp.einsum(spec, t, bp[name].astype(dt))
        if name + "_q4" in bp:
            from ssp_x_vit_tpu.ops.pallas.quant_matmul import unpack_int4

            w = unpack_int4(bp[name + "_q4"])
        else:
            w = bp[name + "_q"]
        y = jnp.einsum(spec, t, w.astype(dt))
        E = y.shape[1]
        return y * bp[name + "_scale"].astype(dt).reshape(1, E, -1)

    g = expert_mm("td,edf->tef", xt, "gate_kernel")
    u = expert_mm("td,edf->tef", xt, "up_kernel")
    y = expert_mm("tef,efd->ted", jax.nn.silu(g) * u, "down_kernel")
    routed = jnp.einsum("te,ted->td", sel, y).reshape(b, s, d)
    if cfg.n_shared_experts:
        routed = routed + _glu(x, bp, dt,
                               ("shared_gate", "shared_up", "shared_down"))
    return routed


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _block(x, bp, cfg: DeepseekConfig, dt, moe: bool,
           ga=None, gm=None, collect_stats: bool = False):
    """One decoder block. ``ga``/``gm`` are scalar float gates (0 skips the
    attention / MLP submodule — the zero-retrace search parameterization the
    llama family uses, cf. llama_forward). ``collect_stats`` additionally
    returns the token-sumsq of the down_proj INPUT (the 2SSP stage-1
    statistic, reference src/pruning.py:271-276) — dense GLU blocks only."""
    attn_out, c_norm, k_rot = _mla_attention(
        _rms(x, bp["ln1"], cfg.rms_eps), bp, cfg, dt)
    if ga is not None:
        attn_out = attn_out * ga.astype(x.dtype)
    x = x + attn_out
    h = _rms(x, bp["ln2"], cfg.rms_eps)
    stats = None
    if moe:
        mlp_out = _deepseek_moe(h, bp, cfg, dt)
    else:
        g = _mm(h, bp, "gate_kernel", dt)
        u = _mm(h, bp, "up_kernel", dt)
        hidden = jax.nn.silu(g) * u
        if collect_stats:
            stats = jnp.sum(jnp.square(hidden.astype(jnp.float32)), axis=1)
        mlp_out = _mm(hidden, bp, "down_kernel", dt)
    if gm is not None:
        mlp_out = mlp_out * gm.astype(x.dtype)
    return x + mlp_out, c_norm, k_rot, stats


def deepseek_forward(params: Params, input_ids: jax.Array,
                     cfg: DeepseekConfig, *, compute_dtype=jnp.bfloat16,
                     return_caches: bool = False,
                     logit_position: Optional[jax.Array] = None,
                     attn_gate: Optional[jax.Array] = None,
                     mlp_gate: Optional[jax.Array] = None,
                     collect_mlp_stats: bool = False,
                     return_block_outputs: bool = False,
                     remat: bool = False):
    """input_ids [b, s] -> logits [b, s, V] f32. ``return_caches`` also
    returns the serving-cache tensors (c [L, b, s, kvr], k_rot [L, b, s, rd],
    rope already applied) — the prefill path of :func:`deepseek_generate`.
    ``logit_position`` (traced ok) computes logits at ONLY that position
    ([b, 1, V]) — prefill paths skip the full [s, V] lm_head matmul.

    Pruning instrumentation (the MLA analogues of llama_forward's):
    ``attn_gate``/``mlp_gate`` [L] float gates skip submodules without a
    retrace; ``collect_mlp_stats`` / ``return_block_outputs`` return an aux
    dict as a second output — ``mlp_stats`` [L, b, f] (dense-GLU configs
    only) and ``block_outputs`` [L, b, s, d]. ``remat`` checkpoints each
    scanned block (per-layer rematerialization for training)."""
    if cfg.pruned_attention_blocks:
        raise ValueError("use deepseek_forward_materialized for "
                         "attention-materialized configs")
    if collect_mlp_stats and cfg.n_moe_layers:
        raise ValueError(
            "2SSP width instrumentation targets dense GLU MLPs; MoE blocks "
            "route tokens per-expert and have no single down_proj input")
    dt = compute_dtype
    x = params["embed"].astype(dt)[input_ids]
    caches = []
    aux_parts = []
    L = cfg.num_layers
    ga_all = attn_gate if attn_gate is not None else jnp.ones((L,), jnp.float32)
    gm_all = mlp_gate if mlp_gate is not None else jnp.ones((L,), jnp.float32)
    want_aux = collect_mlp_stats or return_block_outputs
    nk = cfg.n_dense_layers

    def scan_group(x, blocks, moe, ga, gm):
        def body(x, scanned):
            bp, g_a, g_m = scanned
            x, c, kr, stats = _block(x, bp, cfg, dt, moe, g_a, g_m,
                                     collect_mlp_stats and not moe)
            ys = {"c": c, "kr": kr}
            if collect_mlp_stats and not moe:
                ys["mlp_stats"] = stats
            if return_block_outputs:
                ys["block_outputs"] = x
            return x, ys

        if remat:
            body = jax.checkpoint(body)
        return jax.lax.scan(body, x, (blocks, ga, gm))

    if cfg.n_dense_layers:
        x, ys = scan_group(x, params["dense_blocks"], False,
                           ga_all[:nk], gm_all[:nk])
        caches.append((ys["c"], ys["kr"]))
        aux_parts.append(ys)
    if cfg.n_moe_layers:
        x, ys = scan_group(x, params["moe_blocks"], True,
                           ga_all[nk:], gm_all[nk:])
        caches.append((ys["c"], ys["kr"]))
        aux_parts.append(ys)

    x = _rms(x, params["ln_final"], cfg.rms_eps)
    if logit_position is not None:
        x = jax.lax.dynamic_slice_in_dim(x, logit_position, 1, axis=1)
    logits = _head_logits(x, params, dt)

    aux = {}
    if collect_mlp_stats:
        aux["mlp_stats"] = jnp.concatenate(
            [p["mlp_stats"] for p in aux_parts if "mlp_stats" in p], axis=0)
    if return_block_outputs:
        aux["block_outputs"] = jnp.concatenate(
            [p["block_outputs"] for p in aux_parts], axis=0)

    if not return_caches:
        return (logits, aux) if want_aux else logits
    c_all = jnp.concatenate([c for c, _ in caches], axis=0)
    kr_all = jnp.concatenate([kr for _, kr in caches], axis=0)
    if want_aux:
        return logits, (c_all, kr_all), aux
    return logits, (c_all, kr_all)


_ATTN_BASES = ("ln1", "q_kernel", "q_a_kernel", "q_a_norm", "q_b_kernel",
               "kv_a_kernel", "kv_a_norm", "kv_b_kernel", "o_kernel")
_MLP_BASES = ("ln2", "gate_kernel", "up_kernel", "down_kernel",
              "router", "e_bias", "shared_gate", "shared_up", "shared_down")


def _layer_params(blocks, bases, idx):
    """Per-layer param dict copying whichever storage variant each base key
    has (plain / int8 ``_q`` + ``_scale``) — ops.common.pick_param_variants,
    shared with the llama/ViT materialized forwards."""
    from ssp_x_vit_tpu.ops.common import pick_param_variants

    return pick_param_variants(blocks, bases, idx)


def deepseek_forward_materialized(params: Params, input_ids: jax.Array,
                                  cfg: DeepseekConfig, *,
                                  compute_dtype=jnp.bfloat16,
                                  return_caches: bool = False,
                                  logit_position: Optional[jax.Array] = None):
    """Unrolled forward for attention-materialized models: the MLA weights
    of ``cfg.pruned_attention_blocks`` are physically absent from the group
    stacks (cf. llama_forward_materialized). ``return_caches`` emits the
    compressed cache for the SURVIVING attention layers only, stacked in
    layer order ([L_attn, b, s, ...])."""
    dt = compute_dtype
    x = params["embed"].astype(dt)[input_ids]
    store = cfg.attn_store_index
    nk = cfg.n_dense_layers
    caches = []

    for i in range(cfg.num_layers):
        moe = i >= nk
        blocks = params["moe_blocks" if moe else "dense_blocks"]
        li = i - nk if moe else i
        j = store[i]
        if j is not None:
            bp = _layer_params(blocks, _ATTN_BASES, j)
            attn_out, c, kr = _mla_attention(
                _rms(x, bp["ln1"], cfg.rms_eps), bp, cfg, dt)
            x = x + attn_out
            caches.append((c, kr))
        mp = _layer_params(blocks, _MLP_BASES, li)
        h = _rms(x, mp["ln2"], cfg.rms_eps)
        mlp_out = _deepseek_moe(h, mp, cfg, dt) if moe else _glu(h, mp, dt)
        x = x + mlp_out

    x = _rms(x, params["ln_final"], cfg.rms_eps)
    if logit_position is not None:
        x = jax.lax.dynamic_slice_in_dim(x, logit_position, 1, axis=1)
    logits = _head_logits(x, params, dt)
    if not return_caches:
        return logits
    c_all = jnp.stack([c for c, _ in caches], axis=0)
    kr_all = jnp.stack([kr for _, kr in caches], axis=0)
    return logits, (c_all, kr_all)


# --------------------------------------------------------------------------
# serving: compressed cache + absorbed decode
# --------------------------------------------------------------------------

def _absorbed_decode_attention(x, bp, cfg: DeepseekConfig, dt,
                               c_cache, kr_cache, t):
    """One decode position against the compressed cache (weight absorption).

    x [b, d] is the current token's POST-ln1 hidden state; c_cache
    [b, S, kvr] / kr_cache [b, S, rd] hold positions < t; this step's
    compressed vector is computed here, written at position t, and attended
    to (self-attention includes the current token). Returns (attn_out,
    c_cache, kr_cache) with the caches updated.

    Absorption (exact by linearity): per head, ``q_nope @ W_k^T`` maps the
    query into the compressed space (scores against c directly), and the
    context-in-compressed-space multiplies ``W_v`` on the way out — the
    per-head K/V are never materialized for cached positions.
    """
    b, d = x.shape
    nq, kvr = cfg.num_heads, cfg.kv_lora_rank
    nope, vd = cfg.qk_nope_head_dim, cfg.v_head_dim

    q = _mla_q(x[:, None], bp, cfg, dt)[:, :, 0]              # [b, nq, qk]
    q_nope, q_rot = jnp.split(q, [nope], axis=-1)
    cos, sin = _rope_tables(cfg, t[None])                     # [1, rd]
    q_rot = _apply_rope(q_rot, cos[None], sin[None], cfg.rope_interleave)

    c_new, k_rot_raw = _mla_compressed(x[:, None], bp, cfg, dt)
    k_rot_new = _apply_rope(k_rot_raw, cos[None], sin[None],
                            cfg.rope_interleave)              # [b, 1, rd]
    c_cache = jax.lax.dynamic_update_slice_in_dim(
        c_cache, c_new.astype(c_cache.dtype), t, axis=1)
    kr_cache = jax.lax.dynamic_update_slice_in_dim(
        kr_cache, k_rot_new.astype(kr_cache.dtype), t, axis=1)

    wkv = _kv_b_matrix(bp, dt).reshape(kvr, nq, nope + vd)
    wk = wkv[:, :, :nope]                                     # [kvr, nq, nope]
    wv = wkv[:, :, nope:]                                     # [kvr, nq, vd]

    # compute-dtype operands, f32 accumulation (cf. _mla_attention)
    q_c = jnp.einsum("bhn,rhn->bhr", q_nope, wk,
                     preferred_element_type=jnp.float32).astype(dt)
    scores = (jnp.einsum("bhr,bsr->bhs", q_c, c_cache.astype(dt),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bhp,bsp->bhs", q_rot, kr_cache.astype(dt),
                           preferred_element_type=jnp.float32))
    scores = scores * mla_softmax_scale(cfg)
    S = c_cache.shape[1]
    valid = jnp.arange(S)[None, None] <= t
    probs = jax.nn.softmax(jnp.where(valid, scores, -jnp.inf), axis=-1)
    ctx_c = jnp.einsum("bhs,bsr->bhr", probs.astype(dt), c_cache.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
    out = jnp.einsum("bhr,rhv->bhv", ctx_c, wv,
                     preferred_element_type=jnp.float32).astype(dt)
    out = out.reshape(b, nq * vd)
    return _mm(out, bp, "o_kernel", dt), c_cache, kr_cache


def _decode_step(params: Params, token: jax.Array, cfg: DeepseekConfig, dt,
                 c_caches, kr_caches, t):
    """token [b] at position t -> (logits [b, V], updated caches)."""
    x = params["embed"].astype(dt)[token]                     # [b, d]
    nk = cfg.n_dense_layers

    def run_group(x, blocks, c_grp, kr_grp, moe):
        def body(x, scanned):
            bp, c, kr = scanned
            h = _rms(x, bp["ln1"], cfg.rms_eps)
            attn, c, kr = _absorbed_decode_attention(h, bp, cfg, dt, c, kr, t)
            x = x + attn
            h2 = _rms(x, bp["ln2"], cfg.rms_eps)
            if moe:
                mlp = _deepseek_moe(h2[:, None], bp, cfg, dt)[:, 0]
            else:
                mlp = _glu(h2, bp, dt)
            return x + mlp, (c, kr)

        return jax.lax.scan(body, x, (blocks, c_grp, kr_grp))

    new_c, new_kr = [], []
    if nk:
        x, (c, kr) = run_group(x, params["dense_blocks"],
                               c_caches[:nk], kr_caches[:nk], moe=False)
        new_c.append(c)
        new_kr.append(kr)
    if cfg.n_moe_layers:
        x, (c, kr) = run_group(x, params["moe_blocks"],
                               c_caches[nk:], kr_caches[nk:], moe=True)
        new_c.append(c)
        new_kr.append(kr)
    c_caches = jnp.concatenate(new_c, axis=0)
    kr_caches = jnp.concatenate(new_kr, axis=0)

    x = _rms(x, params["ln_final"], cfg.rms_eps)
    logits = _head_logits(x, params, dt)
    return logits, c_caches, kr_caches


def _decode_step_materialized(params: Params, token: jax.Array,
                              cfg: DeepseekConfig, dt, c_caches, kr_caches, t):
    """Unrolled decode step for attention-materialized models: caches are
    stacked over the SURVIVING attention layers ([La, b, S, ...]); pruned
    blocks run MLP-only."""
    x = params["embed"].astype(dt)[token]
    store = cfg.attn_store_index
    nk = cfg.n_dense_layers
    new_c, new_kr = [], []
    a = 0
    for i in range(cfg.num_layers):
        moe = i >= nk
        blocks = params["moe_blocks" if moe else "dense_blocks"]
        li = i - nk if moe else i
        if store[i] is not None:
            bp = _layer_params(blocks, _ATTN_BASES, store[i])
            h = _rms(x, bp["ln1"], cfg.rms_eps)
            attn, c, kr = _absorbed_decode_attention(
                h, bp, cfg, dt, c_caches[a], kr_caches[a], t)
            x = x + attn
            new_c.append(c)
            new_kr.append(kr)
            a += 1
        mp = _layer_params(blocks, _MLP_BASES, li)
        h2 = _rms(x, mp["ln2"], cfg.rms_eps)
        if moe:
            mlp = _deepseek_moe(h2[:, None], mp, cfg, dt)[:, 0]
        else:
            mlp = _glu(h2, mp, dt)
        x = x + mlp

    x = _rms(x, params["ln_final"], cfg.rms_eps)
    logits = _head_logits(x, params, dt)
    return logits, jnp.stack(new_c, axis=0), jnp.stack(new_kr, axis=0)


def deepseek_generate(params: Params, cfg: DeepseekConfig, prompt,
                      *, max_new_tokens: int = 32,
                      eos_token_id: Optional[int] = None,
                      compute_dtype=jnp.bfloat16):
    """Greedy generation over the compressed MLA cache (absorbed decode):
    prefill once via the full forward (which emits the cache as a side
    output), then one ``lax.scan`` over decode steps.

    ``prompt`` is one id sequence [s] (returns one array: prompt +
    generation, trimmed at eos) or a same-length batch [b, s] (returns a
    list of such arrays — the whole batch decodes in one scan). Ragged
    batches should pad on the caller side or loop; positions here are
    shared across rows.
    """
    arr = np.asarray(prompt, np.int32)
    single = arr.ndim == 1
    batch = arr.reshape(1, -1) if single else arr
    b, s0 = batch.shape
    S = s0 + max_new_tokens
    dt = compute_dtype

    materialized = bool(cfg.pruned_attention_blocks)
    prefill = (deepseek_forward_materialized if materialized
               else deepseek_forward)
    decode = _decode_step_materialized if materialized else _decode_step
    logits, (c, kr) = prefill(
        params, jnp.asarray(batch), cfg, compute_dtype=dt,
        return_caches=True)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)   # [b]

    pad = [(0, 0), (0, 0), (0, S - s0), (0, 0)]
    c_caches = jnp.pad(c.astype(dt), pad)                     # [L, b, S, kvr]
    kr_caches = jnp.pad(kr.astype(dt), pad)

    def step(carry, _):
        token, c_c, kr_c, t = carry
        logits, c_c, kr_c = decode(params, token, cfg, dt,
                                   c_c, kr_c, t)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, c_c, kr_c, t + 1), token

    if max_new_tokens > 1:
        (_, _, _, _), toks = jax.lax.scan(
            step, (first, c_caches, kr_caches, jnp.asarray(s0, jnp.int32)),
            None, length=max_new_tokens)
        gen = np.asarray(toks)                                # [n, b]
    else:
        gen = np.asarray(first)[None]

    outs = []
    for i in range(b):
        seq = gen[:, i].tolist()
        if eos_token_id is not None and eos_token_id in seq:
            seq = seq[: seq.index(eos_token_id) + 1]
        outs.append(np.asarray(batch[i].tolist() + seq, np.int32))
    return outs[0] if single else outs


# --------------------------------------------------------------------------
# HF checkpoints
# --------------------------------------------------------------------------

def config_from_hf_deepseek(d: Dict[str, Any]) -> DeepseekConfig:
    if d.get("model_type") != "deepseek_v3":
        # deepseek_v2 checkpoints score with softmax (+ per-group greedy
        # top-k) instead of sigmoid + correction bias; wiring its router
        # variant is future work — refuse rather than silently mis-route
        raise ValueError(f"not a deepseek_v3 config: {d.get('model_type')}")
    n_routed = d.get("n_routed_experts") or 0
    return DeepseekConfig(
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        num_layers=d["num_hidden_layers"],
        num_heads=d["num_attention_heads"],
        q_lora_rank=d.get("q_lora_rank"),
        kv_lora_rank=d["kv_lora_rank"],
        qk_nope_head_dim=d["qk_nope_head_dim"],
        qk_rope_head_dim=d["qk_rope_head_dim"],
        v_head_dim=d["v_head_dim"],
        rope_interleave=d.get("rope_interleave", True),
        intermediate_size=d["intermediate_size"],
        moe_intermediate_size=d.get("moe_intermediate_size",
                                    d["intermediate_size"]),
        n_routed_experts=n_routed,
        n_shared_experts=d.get("n_shared_experts", 0) if n_routed else 0,
        num_experts_per_tok=d.get("num_experts_per_tok", 8),
        n_group=d.get("n_group", 1) or 1,
        topk_group=d.get("topk_group", 1) or 1,
        norm_topk_prob=d.get("norm_topk_prob", True),
        routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
        first_k_dense_replace=d.get("first_k_dense_replace", 0),
        rope_theta=d.get("rope_theta", 10000.0),
        rope_scaling=parse_rope_scaling(d.get("rope_scaling")),
        rms_eps=d.get("rms_norm_eps", 1e-6),
        tie_embeddings=d.get("tie_word_embeddings", False),
    )


def load_hf_deepseek(model_dir: str,
                     dtype=jnp.float32) -> Tuple[Params, DeepseekConfig]:
    """DeepseekV3ForCausalLM safetensors -> the two-group stacked layout."""
    from ssp_x_vit_tpu.models.checkpoints import _read_safetensors

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = config_from_hf_deepseek(json.load(f))

    sd: Dict[str, np.ndarray] = {}
    for shard in sorted(glob.glob(os.path.join(model_dir, "*.safetensors"))):
        sd.update(_read_safetensors(shard))
    if not sd:
        raise FileNotFoundError(f"no safetensors shards in {model_dir}")

    def g(key):
        return np.asarray(sd[key], np.float32)

    def t(x):
        return np.ascontiguousarray(x.T)

    def attn_block(i):
        pre = f"model.layers.{i}"
        bp = {
            "ln1": g(pre + ".input_layernorm.weight"),
            "ln2": g(pre + ".post_attention_layernorm.weight"),
            "kv_a_kernel": t(g(pre + ".self_attn.kv_a_proj_with_mqa.weight")),
            "kv_a_norm": g(pre + ".self_attn.kv_a_layernorm.weight"),
            "kv_b_kernel": t(g(pre + ".self_attn.kv_b_proj.weight")),
            "o_kernel": t(g(pre + ".self_attn.o_proj.weight")),
        }
        if cfg.q_lora_rank is None:
            bp["q_kernel"] = t(g(pre + ".self_attn.q_proj.weight"))
        else:
            bp["q_a_kernel"] = t(g(pre + ".self_attn.q_a_proj.weight"))
            bp["q_a_norm"] = g(pre + ".self_attn.q_a_layernorm.weight")
            bp["q_b_kernel"] = t(g(pre + ".self_attn.q_b_proj.weight"))
        return bp

    def stack(dicts):
        return {k: jnp.asarray(np.stack([d[k] for d in dicts]), dtype)
                for k in dicts[0]}

    dense, moe = [], []
    for i in range(cfg.num_layers):
        bp = attn_block(i)
        pre = f"model.layers.{i}.mlp"
        if i < cfg.n_dense_layers:
            bp["gate_kernel"] = t(g(pre + ".gate_proj.weight"))
            bp["up_kernel"] = t(g(pre + ".up_proj.weight"))
            bp["down_kernel"] = t(g(pre + ".down_proj.weight"))
            dense.append(bp)
        else:
            bp["router"] = t(g(pre + ".gate.weight"))          # [d, E]
            bp["e_bias"] = g(pre + ".gate.e_score_correction_bias")
            for ours, theirs in (("gate_kernel", "gate_proj"),
                                 ("up_kernel", "up_proj"),
                                 ("down_kernel", "down_proj")):
                bp[ours] = np.stack([
                    t(g(f"{pre}.experts.{e}.{theirs}.weight"))
                    for e in range(cfg.n_routed_experts)])
            if cfg.n_shared_experts:
                bp["shared_gate"] = t(g(pre + ".shared_experts.gate_proj.weight"))
                bp["shared_up"] = t(g(pre + ".shared_experts.up_proj.weight"))
                bp["shared_down"] = t(g(pre + ".shared_experts.down_proj.weight"))
            moe.append(bp)

    params: Params = {
        "embed": jnp.asarray(g("model.embed_tokens.weight"), dtype),
        "ln_final": jnp.asarray(g("model.norm.weight"), dtype),
    }
    if dense:
        params["dense_blocks"] = stack(dense)
    if moe:
        params["moe_blocks"] = stack(moe)
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(t(g("lm_head.weight")), dtype)
    return params, cfg


def hf_dict_from_deepseek(cfg: DeepseekConfig) -> Dict[str, Any]:
    """Inverse of :func:`config_from_hf_deepseek`: a config.json dict that
    transformers ``DeepseekV3Config`` accepts and that round-trips through
    the parser. Dense-only configs (n_routed_experts == 0) export with
    ``first_k_dense_replace == num_layers`` so no HF layer instantiates a
    router."""
    from ssp_x_vit_tpu.llm.rope import export_rope_scaling

    dense_only = cfg.n_routed_experts == 0
    return {
        "architectures": ["DeepseekV3ForCausalLM"],
        "model_type": "deepseek_v3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_heads,
        "q_lora_rank": cfg.q_lora_rank,
        "kv_lora_rank": cfg.kv_lora_rank,
        "qk_nope_head_dim": cfg.qk_nope_head_dim,
        "qk_rope_head_dim": cfg.qk_rope_head_dim,
        # HF DeepseekV3Config: rotary tables are built at head_dim, which
        # for MLA equals the rope sub-dimension
        "head_dim": cfg.qk_rope_head_dim,
        "v_head_dim": cfg.v_head_dim,
        "rope_interleave": cfg.rope_interleave,
        # width-pruned (2SSP stage-1) models export with the PRUNED
        # intermediate size — the reference's save_pretrained convention
        # (src/pruning.py:286-290)
        "intermediate_size": cfg.effective_intermediate,
        "moe_intermediate_size": cfg.moe_intermediate_size,
        "n_routed_experts": cfg.n_routed_experts,
        "n_shared_experts": cfg.n_shared_experts if not dense_only else 0,
        "num_experts_per_tok": cfg.num_experts_per_tok,
        "n_group": cfg.n_group,
        "topk_group": cfg.topk_group,
        "norm_topk_prob": cfg.norm_topk_prob,
        "routed_scaling_factor": cfg.routed_scaling_factor,
        "first_k_dense_replace": (cfg.num_layers if dense_only
                                  else cfg.first_k_dense_replace),
        "hidden_act": cfg.hidden_act,
        "rope_theta": cfg.rope_theta,
        "rope_scaling": export_rope_scaling(cfg.rope_scaling),
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": cfg.tie_embeddings,
        "attention_bias": False,
    }


def export_hf_deepseek(out_dir: str, params: Params,
                       cfg: DeepseekConfig) -> str:
    """Export a DeepSeek pytree as an HF checkpoint (config.json +
    model.safetensors) that ``DeepseekV3ForCausalLM.from_pretrained`` loads
    with identical logits — the exact inverse of :func:`load_hf_deepseek`
    (kernels transposed back to [out, in], the two stacked groups unrolled
    to global layer indices, expert stacks unstacked). Quantized pytrees
    are refused (int8 codes have no HF encoding — export dense and
    re-quantize after from_pretrained)."""
    from ssp_x_vit_tpu.models.checkpoints import _write_safetensors

    for grp in ("dense_blocks", "moe_blocks"):
        if grp in params and any(k.endswith(("_q", "_q4", "_scale"))
                                 for k in params[grp]):
            raise ValueError("quantized pytrees have no HF encoding — "
                             "export the dense params and quantize after "
                             "from_pretrained")
    if "lm_head_q" in params:
        raise ValueError("quantized lm_head has no HF encoding")
    if cfg.pruned_attention_blocks:
        raise ValueError("attention-materialized models have no HF encoding "
                         "(DeepseekV3 layers always carry self_attn) — use "
                         "save_deepseek_model for the native artifact")

    hf_cfg = hf_dict_from_deepseek(cfg)
    os.makedirs(out_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr, np.float32)
        tensors[name] = np.ascontiguousarray(a.T if transpose else a)

    nk = cfg.n_dense_layers
    for i in range(cfg.num_layers):
        moe = i >= nk
        blocks = params["moe_blocks" if moe else "dense_blocks"]
        li = i - nk if moe else i
        pre = f"model.layers.{i}"
        put(pre + ".input_layernorm.weight", blocks["ln1"][li])
        put(pre + ".post_attention_layernorm.weight", blocks["ln2"][li])
        put(pre + ".self_attn.kv_a_proj_with_mqa.weight",
            blocks["kv_a_kernel"][li], True)
        put(pre + ".self_attn.kv_a_layernorm.weight", blocks["kv_a_norm"][li])
        put(pre + ".self_attn.kv_b_proj.weight", blocks["kv_b_kernel"][li],
            True)
        put(pre + ".self_attn.o_proj.weight", blocks["o_kernel"][li], True)
        if cfg.q_lora_rank is None:
            put(pre + ".self_attn.q_proj.weight", blocks["q_kernel"][li],
                True)
        else:
            put(pre + ".self_attn.q_a_proj.weight", blocks["q_a_kernel"][li],
                True)
            put(pre + ".self_attn.q_a_layernorm.weight",
                blocks["q_a_norm"][li])
            put(pre + ".self_attn.q_b_proj.weight", blocks["q_b_kernel"][li],
                True)
        mp = pre + ".mlp"
        if not moe:
            put(mp + ".gate_proj.weight", blocks["gate_kernel"][li], True)
            put(mp + ".up_proj.weight", blocks["up_kernel"][li], True)
            put(mp + ".down_proj.weight", blocks["down_kernel"][li], True)
        else:
            put(mp + ".gate.weight", blocks["router"][li], True)
            put(mp + ".gate.e_score_correction_bias", blocks["e_bias"][li])
            for ours, theirs in (("gate_kernel", "gate_proj"),
                                 ("up_kernel", "up_proj"),
                                 ("down_kernel", "down_proj")):
                for e in range(cfg.n_routed_experts):
                    put(f"{mp}.experts.{e}.{theirs}.weight",
                        blocks[ours][li][e], True)
            if cfg.n_shared_experts:
                put(mp + ".shared_experts.gate_proj.weight",
                    blocks["shared_gate"][li], True)
                put(mp + ".shared_experts.up_proj.weight",
                    blocks["shared_up"][li], True)
                put(mp + ".shared_experts.down_proj.weight",
                    blocks["shared_down"][li], True)

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["ln_final"])
    if not cfg.tie_embeddings and "lm_head" in params:
        put("lm_head.weight", params["lm_head"], True)

    _write_safetensors(os.path.join(out_dir, "model.safetensors"), tensors,
                       metadata={"format": "pt"})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return out_dir


def save_deepseek_model(out_dir: str, params: Params,
                        cfg: DeepseekConfig) -> str:
    """Persist a DeepSeek model (dense or int8-quantized pytree) as
    model.npz + config.json — the native serving-deployment artifact
    (cf. checkpoints.save_llm_model)."""
    from ssp_x_vit_tpu.models.checkpoints import save_params_npz

    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(os.path.join(out_dir, "model.npz"), params)
    d = dataclasses.asdict(cfg)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f, indent=2)
    return out_dir


def load_deepseek_model(model_dir: str,
                        dtype=jnp.bfloat16) -> Tuple[Params, DeepseekConfig]:
    """Inverse of save_deepseek_model; int8 codes keep their dtype
    (quantized models round-trip losslessly), float leaves cast to
    ``dtype``."""
    from ssp_x_vit_tpu.models.checkpoints import load_params_npz

    with open(os.path.join(model_dir, "config.json")) as f:
        d = json.load(f)
    if isinstance(d.get("rope_scaling"), dict):
        d["rope_scaling"] = RopeScaling(**d["rope_scaling"])
    cfg = DeepseekConfig(**d)
    params = load_params_npz(os.path.join(model_dir, "model.npz"),
                             dtype=dtype)
    return params, cfg
