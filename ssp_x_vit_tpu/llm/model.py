"""Functional JAX causal LM (Llama-class: Llama-2 / Mistral / Qwen2 layout).

Same pruning-native design as the ViT (models/vit.py): stacked block params +
``lax.scan``; runtime ``attn_gate`` / ``mlp_gate`` / ``neuron_mask`` arguments
replace the reference's forward monkey-patching (src/utilities.py:69-135) so
the stage-2 greedy search (src/utilities.py:447-505) and blockpruner
(src/pruning.py:127-194) evaluate every candidate with ZERO retraces; width
pruning materializes once via gather (src/utilities.py:392-425 semantics).

Architecture: RMSNorm, rotary position embeddings, GQA (num_kv_heads), SwiGLU
MLP (gate/up/down), optional tied embeddings. Matches HF ``LlamaForCausalLM``
numerics for checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.rope import RopeScaling

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    # HF rope_scaling (llama-3.1 "llama3", YaRN, linear) — a frozen
    # RopeScaling (llm/rope.py) so the config stays hashable/static under
    # jit. None = vanilla RoPE. "dynamic" NTK is refused (llm/rope.py).
    rope_scaling: Optional["RopeScaling"] = None
    tie_embeddings: bool = False
    # llama | mistral | qwen2 share the pre-RMSNorm SwiGLU block; phi3 maps to
    # the same layout at load time (fused qkv/gate_up split by the loader);
    # "gemma" rides the same layout with gelu_tanh GLU, sqrt(d)-scaled
    # embeddings, (1+w) RMS scales baked into the weights at load, explicit
    # head_dim, and a tied head;
    # "phi" (phi-2) selects the parallel-residual LayerNorm+GELU block;
    # "opt" the sequential LayerNorm block with learned positions + ReLU MLP
    # (reference src/slicegpt_utils/adapters/opt_adapter.py).
    model_type: str = "llama"
    # Sliding-window attention (mistral): each position attends the most
    # recent `sliding_window` keys including itself (HF convention). None =
    # full causal. Serving keeps absolute-position RoPE keys in the cache and
    # masks beyond the window, so cached decode == full recompute exactly.
    sliding_window: Optional[int] = None
    qkv_bias: bool = False     # qwen2/phi/opt use attention biases
    # phi-2 specifics
    rotary_dim: Optional[int] = None   # partial rotary (e.g. 32 of head_dim 80)
    layer_norm_eps: float = 1e-5       # phi/opt use LayerNorm (with bias)
    # opt specifics
    max_position_embeddings: int = 2048  # learned positional table size
    # MoE (mixtral-style switch FFN; llama layout only). 0 = dense MLP.
    num_experts: int = 0
    expert_capacity_factor: float = 1.25
    router_aux_coef: float = 0.01  # load-balance loss weight in training
    moe_top_k: int = 1  # experts per token (1 = switch, 2 = mixtral)
    # gemma specifics (usable by any llama-layout config)
    explicit_head_dim: Optional[int] = None  # gemma-7b: 256 != hidden/heads
    hidden_act: str = "silu"                 # "gelu_tanh" for gemma GLU
    scale_embeddings: bool = False           # x *= sqrt(hidden_size)
    # MIXED attention: indices of layers the sliding window applies to
    # (None = all layers when sliding_window is set). qwen2: layers >=
    # max_window_layers; gemma-2: even layers. Mixed configs run the
    # traced-bound mask path (flash kernels need a static window).
    window_layers: Optional[Tuple[int, ...]] = None
    # gemma-2 softcaps: logits <- cap * tanh(logits / cap)
    attn_softcap: Optional[float] = None     # attention logits (50.0)
    final_softcap: Optional[float] = None    # lm_head logits (30.0)
    # qwen3: per-head RMSNorm on q/k (over head_dim, rms_eps) after the
    # projections, BEFORE rope (HF Qwen3Attention). Params q_norm/k_norm
    # [L, head_dim].
    qk_norm: bool = False

    @property
    def is_phi(self) -> bool:
        return self.model_type == "phi"

    @property
    def is_opt(self) -> bool:
        return self.model_type == "opt"

    @property
    def is_gemma2(self) -> bool:
        return self.model_type == "gemma2"

    @property
    def uniform_window(self) -> bool:
        """True when every layer shares one (possibly absent) window — the
        static-mask / flash-kernel regime."""
        return self.sliding_window is None or self.window_layers is None

    # Large sentinel bound for full-attention layers in mixed configs: the
    # band test `row - col < bound` is vacuous for any real sequence.
    _FULL_BOUND = 1 << 30

    @property
    def layer_window_bounds(self) -> Tuple[int, ...]:
        """Per-layer int bounds ([L]): the window for windowed layers,
        _FULL_BOUND for full-attention layers (mixed configs only)."""
        wl = set(self.window_layers or ())
        return tuple(self.sliding_window if i in wl else self._FULL_BOUND
                     for i in range(self.num_layers))
    # --- materialized-pruning state ---
    # Uniform kept intermediate size after 2SSP stage-1 (reference sets
    # config.intermediate_size = num_preserve, src/pruning.py:286).
    pruned_intermediate_size: Optional[int] = None
    pruned_attention_blocks: Tuple[int, ...] = ()

    @property
    def head_dim(self) -> int:
        if self.explicit_head_dim is not None:
            return self.explicit_head_dim
        return self.hidden_size // self.num_heads

    @property
    def effective_intermediate(self) -> int:
        return self.pruned_intermediate_size or self.intermediate_size

    @property
    def attn_store_index(self) -> Tuple[Optional[int], ...]:
        idx, j = [], 0
        for i in range(self.num_layers):
            if i in self.pruned_attention_blocks:
                idx.append(None)
            else:
                idx.append(j)
                j += 1
        return tuple(idx)


def _glu_act(cfg: LlamaConfig):
    """GLU gate activation: silu (llama/mistral/qwen2) or tanh-approx gelu
    (gemma's gelu_pytorch_tanh)."""
    if cfg.hidden_act == "silu":
        return jax.nn.silu
    if cfg.hidden_act == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unsupported hidden_act {cfg.hidden_act}")


def _embed_tokens(params: Params, input_ids, cfg: LlamaConfig, compute_dtype):
    """Token embedding lookup; gemma scales by sqrt(hidden_size) with the
    normalizer ROUNDED to the compute dtype (HF GemmaModel casts the
    normalizer tensor before multiplying)."""
    x = params["embed"].astype(compute_dtype)[input_ids]
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, compute_dtype)
    return x


def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hq = cfg.num_heads * cfg.head_dim
    hkv = cfg.num_kv_heads * cfg.head_dim
    ks = iter(jax.random.split(rng, 12))

    def nrm(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    if cfg.is_opt:
        # OPT-125m-class layout: sequential pre-LN block (do_layer_norm_before
        # =True), learned positions (offset 2), ReLU fc MLP, tied head
        # (reference adapters/opt_adapter.py:18-113).
        params: Params = {
            "embed": nrm(next(ks), (cfg.vocab_size, d)),
            "pos_embed": nrm(next(ks), (cfg.max_position_embeddings + 2, d)),
            "blocks": {
                "ln1": jnp.ones((L, d), dtype),
                "ln1_bias": jnp.zeros((L, d), dtype),
                "q_kernel": nrm(next(ks), (L, d, hq)),
                "q_bias": jnp.zeros((L, hq), dtype),
                "k_kernel": nrm(next(ks), (L, d, hkv)),
                "k_bias": jnp.zeros((L, hkv), dtype),
                "v_kernel": nrm(next(ks), (L, d, hkv)),
                "v_bias": jnp.zeros((L, hkv), dtype),
                "o_kernel": nrm(next(ks), (L, hq, d)),
                "o_bias": jnp.zeros((L, d), dtype),
                "ln2": jnp.ones((L, d), dtype),
                "ln2_bias": jnp.zeros((L, d), dtype),
                "fc1_kernel": nrm(next(ks), (L, d, f)),
                "fc1_bias": jnp.zeros((L, f), dtype),
                "fc2_kernel": nrm(next(ks), (L, f, d)),
                "fc2_bias": jnp.zeros((L, d), dtype),
            },
            "ln_final": jnp.ones((d,), dtype),
            "ln_final_bias": jnp.zeros((d,), dtype),
        }
        if not cfg.tie_embeddings:
            params["lm_head"] = nrm(next(ks), (d, cfg.vocab_size))
        return params

    if cfg.is_phi:
        params: Params = {
            "embed": nrm(next(ks), (cfg.vocab_size, d)),
            "blocks": {
                "ln1": jnp.ones((L, d), dtype),
                "ln1_bias": jnp.zeros((L, d), dtype),
                "q_kernel": nrm(next(ks), (L, d, hq)),
                "q_bias": jnp.zeros((L, hq), dtype),
                "k_kernel": nrm(next(ks), (L, d, hkv)),
                "k_bias": jnp.zeros((L, hkv), dtype),
                "v_kernel": nrm(next(ks), (L, d, hkv)),
                "v_bias": jnp.zeros((L, hkv), dtype),
                "o_kernel": nrm(next(ks), (L, hq, d)),
                "o_bias": jnp.zeros((L, d), dtype),
                "fc1_kernel": nrm(next(ks), (L, d, f)),
                "fc1_bias": jnp.zeros((L, f), dtype),
                "fc2_kernel": nrm(next(ks), (L, f, d)),
                "fc2_bias": jnp.zeros((L, d), dtype),
            },
            "ln_final": jnp.ones((d,), dtype),
            "ln_final_bias": jnp.zeros((d,), dtype),
            "lm_head": nrm(next(ks), (d, cfg.vocab_size)),
            "lm_head_bias": jnp.zeros((cfg.vocab_size,), dtype),
        }
        return params

    params: Params = {
        "embed": nrm(next(ks), (cfg.vocab_size, d)),
        "blocks": {
            "ln1": jnp.ones((L, d), dtype),
            "q_kernel": nrm(next(ks), (L, d, hq)),
            "k_kernel": nrm(next(ks), (L, d, hkv)),
            "v_kernel": nrm(next(ks), (L, d, hkv)),
            "o_kernel": nrm(next(ks), (L, hq, d)),
            "ln2": jnp.ones((L, d), dtype),
        },
        "ln_final": jnp.ones((d,), dtype),
    }
    if cfg.num_experts:
        # MoE (mixtral-style): per-layer switch router + expert-stacked
        # SwiGLU kernels — the per-layer slices match parallel/moe.py's
        # param contract exactly, so the block MLP IS moe_ffn. Key draw
        # order stays after the attention draws (same-seed dense weights
        # are bit-identical to pre-MoE rounds).
        E = cfg.num_experts
        params["blocks"].update({
            "router": nrm(next(ks), (L, d, E)),
            "gate_kernel": nrm(next(ks), (L, E, d, f)),
            "up_kernel": nrm(next(ks), (L, E, d, f)),
            "down_kernel": nrm(next(ks), (L, E, f, d)),
        })
    else:
        params["blocks"].update({
            "gate_kernel": nrm(next(ks), (L, d, f)),
            "up_kernel": nrm(next(ks), (L, d, f)),
            "down_kernel": nrm(next(ks), (L, f, d)),
        })
    if cfg.is_gemma2:
        # post-norms on the residual deltas (HF Gemma2DecoderLayer)
        params["blocks"]["ln1_post"] = jnp.ones((L, d), dtype)
        params["blocks"]["ln2_post"] = jnp.ones((L, d), dtype)
    if cfg.qkv_bias:
        params["blocks"]["q_bias"] = jnp.zeros((L, hq), dtype)
        params["blocks"]["k_bias"] = jnp.zeros((L, hkv), dtype)
        params["blocks"]["v_bias"] = jnp.zeros((L, hkv), dtype)
    if cfg.qk_norm:
        params["blocks"]["q_norm"] = jnp.ones((L, cfg.head_dim), dtype)
        params["blocks"]["k_norm"] = jnp.ones((L, cfg.head_dim), dtype)
    if not cfg.tie_embeddings:
        params["lm_head"] = nrm(next(ks), (d, cfg.vocab_size))
    return params


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _rope(q: jax.Array, k: jax.Array,
          cfg: "LlamaConfig") -> Tuple[jax.Array, jax.Array]:
    """Rotary embeddings, HF half-rotation layout. q/k: [b, h, s, hd]
    (already sliced to the rotary dims for partial rotary). Frequencies —
    including any ``rope_scaling`` correction (llama3/yarn/linear) — come
    from llm/rope.py so every path derives identical values."""
    from ssp_x_vit_tpu.llm.rope import rope_freqs

    hd = q.shape[-1]
    s = q.shape[2]
    inv_freq_np, attn_scale = rope_freqs(cfg.rope_theta, hd, cfg.rope_scaling)
    inv_freq = jnp.asarray(inv_freq_np)
    pos = jnp.arange(s, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)                      # [s, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)        # [s, hd]
    cos = (jnp.cos(emb) * attn_scale)[None, None]
    sin = (jnp.sin(emb) * attn_scale)[None, None]

    def rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = q32 * cos + rotate_half(q32) * sin
    k_out = k32 * cos + rotate_half(k32) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def _mm(x, bp, name, compute_dtype):
    """Quantization-aware projection matmul (ops.common.mm_quant) so the
    EVALUATION paths (perplexity, zeroshot, lm-eval) and the serving paths
    share one dispatch for int8/int4 pytrees (llm/quant.py)."""
    from ssp_x_vit_tpu.ops.common import mm_quant

    return mm_quant(x, bp, name, compute_dtype)


def _attention(x, bp, cfg: LlamaConfig, compute_dtype, window_override=None):
    """``window_override``: TRACED per-layer window bound (mixed configs,
    scanned alongside the blocks) — forces the dynamic-mask sdpa path; the
    flash kernels need a static window."""
    b, s, d = x.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q = _mm(x, bp, "q_kernel", compute_dtype)
    k = _mm(x, bp, "k_kernel", compute_dtype)
    v = _mm(x, bp, "v_kernel", compute_dtype)
    if "q_bias" in bp:
        q = q + bp["q_bias"].astype(compute_dtype)
        k = k + bp["k_bias"].astype(compute_dtype)
        v = v + bp["v_bias"].astype(compute_dtype)

    q = q.reshape(b, s, nq, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm:
        # qwen3: per-head RMSNorm over head_dim before rope
        q = rms_norm(q, bp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, bp["k_norm"], cfg.rms_eps)
    if cfg.is_opt:
        pass  # OPT uses learned absolute positions at the embedding, no rope
    elif cfg.rotary_dim is not None and cfg.rotary_dim < hd:
        # phi partial rotary: rotate the first rotary_dim dims, pass the rest
        rd = cfg.rotary_dim
        q_rot, k_rot = _rope(q[..., :rd], k[..., :rd], cfg)
        q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
        k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
    else:
        q, k = _rope(q, k, cfg)
    from ssp_x_vit_tpu.ops.dispatch import FLASH_MIN_SEQ, use_pallas

    window = cfg.sliding_window if window_override is None else window_override
    if window_override is None and window is not None and window >= s:
        window = None  # full causal within this sequence — same program
    # Traced per-layer windows run the sdpa path — the flash kernels take
    # static masks only. Softcap (gemma-2) rides the flash kernels as a
    # static tanh epilogue in BOTH directions (the backward kernels carry
    # the tanh chain rule), so capped long-context training never
    # materializes [s, s] logits.
    if use_pallas() and s >= FLASH_MIN_SEQ and window_override is None:
        from ssp_x_vit_tpu.ops.pallas.flash_attention import flash_attention

        # GQA-native kernel: K/V stay at nkv heads; the query group shares
        # the resident K/V in-kernel (no jnp.repeat HBM materialization).
        # Sliding windows (mistral) ride the same kernels with out-of-band
        # k-blocks predicated off — no [s, s] logits materialization.
        out = flash_attention(q, k, v, causal=True, window=window,
                              softcap=cfg.attn_softcap)
    else:
        from ssp_x_vit_tpu.ops.attention import sdpa_reference

        if nkv != nq:
            k = jnp.repeat(k, nq // nkv, axis=1)
            v = jnp.repeat(v, nq // nkv, axis=1)
        out = sdpa_reference(q, k, v, causal=True, window=window,
                             softcap=cfg.attn_softcap)

    out = out.transpose(0, 2, 1, 3).reshape(b, s, nq * hd)
    out = _mm(out, bp, "o_kernel", compute_dtype)
    if "o_bias" in bp:
        out = out + bp["o_bias"].astype(compute_dtype)
    return out


def _phi_mlp(x, bp, compute_dtype, neuron_mask, collect_stats, stats_kind="sumsq",
             act="gelu"):
    """fc1 -> activation -> fc2 MLP (phi-2: exact GELU; OPT: ReLU). The
    reference prunes fc1 rows/fc2 cols (src/utilities.py:419-422); hooks
    observe the fc2 input."""
    h = _mm(x, bp, "fc1_kernel", compute_dtype) + bp["fc1_bias"].astype(compute_dtype)
    if act == "relu":
        h = jax.nn.relu(h)
    else:
        from ssp_x_vit_tpu.ops.common import gelu as _gelu

        h = _gelu(h)
    stats = None
    if collect_stats:
        h32 = h.astype(jnp.float32)
        stats = jnp.sum(jnp.square(h32) if stats_kind == "sumsq" else jnp.abs(h32), axis=1)
    if neuron_mask is not None:
        h = h * neuron_mask.astype(h.dtype)
    return _mm(h, bp, "fc2_kernel", compute_dtype) + bp["fc2_bias"].astype(compute_dtype), stats


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _moe_mlp(x, bp, cfg: LlamaConfig, compute_dtype):
    """Switch-MoE block MLP: the per-layer param slice IS parallel/moe.py's
    contract (router [d,E], expert-stacked SwiGLU kernels). Uses the
    DROPLESS formulation (every token through its routed expert, no
    capacity overflow) so the forward is sequence-length-independent —
    KV-cached decode equals the full-recompute forward exactly; the
    capacity/dispatch GShard form stays available in parallel/moe.py for
    giant-E training. Expert parallelism comes from placing the expert
    axis of the weights over an 'expert' mesh axis
    (moe_llama_param_specs_like)."""
    from ssp_x_vit_tpu.parallel.moe import MoEConfig, moe_ffn_dropless

    mcfg = MoEConfig(cfg.hidden_size, cfg.intermediate_size, cfg.num_experts,
                     cfg.expert_capacity_factor, top_k=cfg.moe_top_k)
    p = {"router": bp["router"]}
    for k in ("gate_kernel", "up_kernel", "down_kernel"):
        if k in bp:
            p[k] = bp[k]
        else:  # int8/int4-quantized expert kernels (llm/quant.py)
            qk = k + "_q" if k + "_q" in bp else k + "_q4"
            p[qk] = bp[qk]
            p[k + "_scale"] = bp[k + "_scale"]
    y, aux = moe_ffn_dropless(p, x.astype(compute_dtype), mcfg)
    return y.astype(compute_dtype), aux["aux_loss"]


def _mlp(x, bp, compute_dtype, neuron_mask, collect_stats, stats_kind="sumsq",
         act=jax.nn.silu):
    g = _mm(x, bp, "gate_kernel", compute_dtype)
    u = _mm(x, bp, "up_kernel", compute_dtype)
    h = act(g) * u  # the down_proj input the reference hooks observe
    stats = None
    if collect_stats:
        h32 = h.astype(jnp.float32)
        # "sumsq" feeds the token-L2 importance (2SSP); "sumabs" the L1
        # variant (ablation two_stage_2ssp_l1_norm).
        stats = jnp.sum(jnp.square(h32) if stats_kind == "sumsq" else jnp.abs(h32), axis=1)
    if neuron_mask is not None:
        h = h * neuron_mask.astype(h.dtype)
    return _mm(h, bp, "down_kernel", compute_dtype), stats


def _head_logits(params, x, compute_dtype, final_softcap=None):
    """Final lm_head projection -> f32 logits: tied-embed fallback, int8/int4
    via _mm (so W8A8 and quantized dispatch stay CONSISTENT with the block
    projections), optional bias, gemma-2 final soft-capping. Shared by both
    forward tails."""
    if any(k in params for k in ("lm_head", "lm_head_q", "lm_head_q4")):
        logits = _mm(x, params, "lm_head", compute_dtype).astype(jnp.float32)
    else:
        logits = (x @ params["embed"].T.astype(compute_dtype)).astype(jnp.float32)
    if "lm_head_bias" in params:
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    if final_softcap is not None:
        logits = final_softcap * jnp.tanh(logits / final_softcap)
    return logits


def llama_forward(
    params: Params,
    input_ids: jax.Array,
    cfg: LlamaConfig,
    *,
    attn_gate: Optional[jax.Array] = None,
    mlp_gate: Optional[jax.Array] = None,
    neuron_mask: Optional[jax.Array] = None,
    collect_mlp_stats: bool = False,
    mlp_stats_kind: str = "sumsq",
    collect_mlp_io_stats: bool = False,
    return_block_outputs: bool = False,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """input_ids [b, s] -> (logits [b, s, V] fp32, aux).

    Gates/masks as in vit_forward. ``collect_mlp_stats`` returns the per-block,
    per-sample token-sumsq of the down_proj INPUT ([L, b, f]) — the 2SSP
    stage-1 statistic (reference src/pruning.py:271-276 via
    get_mlp_hidden_state hooks). ``return_block_outputs`` returns each block's
    output hidden states (shortGPT / window_based need them).

    ``remat=True`` checkpoints each scanned layer (training path): backward
    recomputes the layer forward instead of storing its intermediates, so
    activation memory is O(L·b·s·d) carries instead of every matmul/attention
    intermediate — the standard trade for long-sequence training.
    """
    if cfg.pruned_attention_blocks:
        raise ValueError("use llama_forward_materialized for depth-materialized configs")
    if cfg.num_experts:
        if cfg.is_phi or cfg.is_opt:
            raise ValueError("MoE is supported on the llama block layout only")
        if collect_mlp_stats or collect_mlp_io_stats or neuron_mask is not None:
            raise ValueError(
                "2SSP width instrumentation targets dense MLPs; MoE configs "
                "route tokens per-expert and do not support neuron masks/stats")
    L = cfg.num_layers
    x = _embed_tokens(params, input_ids, cfg, compute_dtype)
    if cfg.is_opt:
        # learned absolute positions, HF offset of 2 (OPTLearnedPositionalEmbedding)
        pos = 2 + jnp.arange(input_ids.shape[1])
        x = x + params["pos_embed"].astype(compute_dtype)[pos][None]

    gates_a = attn_gate if attn_gate is not None else jnp.ones((L,), jnp.float32)
    gates_m = mlp_gate if mlp_gate is not None else jnp.ones((L,), jnp.float32)
    nmask = neuron_mask if neuron_mask is not None else jnp.ones((L, 1), jnp.float32)
    # mixed per-layer windows ride the scan as traced bounds; uniform
    # configs keep the static (flash-capable) path
    wbounds = jnp.asarray(cfg.layer_window_bounds, jnp.int32)

    def body(x, scanned):
        bp, ga, gm, nm, wb = scanned
        wo = None if cfg.uniform_window else wb
        out = {}
        if cfg.is_phi:
            # phi-2 parallel residual: one LayerNorm feeds BOTH branches,
            # x' = x + attn(h) + mlp(h).
            h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
            attn_out = _attention(h, bp, cfg, compute_dtype)
            mlp_out, stats = _phi_mlp(h, bp, compute_dtype, nm, collect_mlp_stats,
                                      mlp_stats_kind)
            if collect_mlp_stats:
                out["mlp_stats"] = stats
            if collect_mlp_io_stats:
                out["mlp_in_stats"] = jnp.sum(jnp.square(h.astype(jnp.float32)), axis=1)
                out["mlp_out_stats"] = jnp.sum(jnp.square(mlp_out.astype(jnp.float32)), axis=1)
            x = x + attn_out * ga.astype(x.dtype) + mlp_out * gm.astype(x.dtype)
            if return_block_outputs:
                out["block_outputs"] = x
            return x, out

        if cfg.is_opt:
            # OPT sequential pre-LN block: LN1 -> attn -> residual,
            # LN2 -> fc MLP (ReLU) -> residual.
            h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
            attn_out = _attention(h, bp, cfg, compute_dtype)
            x = x + attn_out * ga.astype(x.dtype)
            mlp_in = _layer_norm(x, bp["ln2"], bp["ln2_bias"], cfg.layer_norm_eps)
            mlp_out, stats = _phi_mlp(mlp_in, bp, compute_dtype, nm,
                                      collect_mlp_stats, mlp_stats_kind, act="relu")
            if collect_mlp_stats:
                out["mlp_stats"] = stats
            if collect_mlp_io_stats:
                out["mlp_in_stats"] = jnp.sum(jnp.square(mlp_in.astype(jnp.float32)), axis=1)
                out["mlp_out_stats"] = jnp.sum(jnp.square(mlp_out.astype(jnp.float32)), axis=1)
            x = x + mlp_out * gm.astype(x.dtype)
            if return_block_outputs:
                out["block_outputs"] = x
            return x, out

        attn_out = _attention(rms_norm(x, bp["ln1"], cfg.rms_eps), bp, cfg,
                              compute_dtype, window_override=wo)
        if cfg.is_gemma2:
            # gemma-2 post-norms: the residual deltas are RMS-normalized
            # before the adds (HF Gemma2DecoderLayer)
            attn_out = rms_norm(attn_out, bp["ln1_post"], cfg.rms_eps)
        x = x + attn_out * ga.astype(x.dtype)
        mlp_in = rms_norm(x, bp["ln2"], cfg.rms_eps)
        if cfg.num_experts:
            mlp_out, aux_loss = _moe_mlp(mlp_in, bp, cfg, compute_dtype)
            out["moe_aux_loss"] = aux_loss
            stats = None
        else:
            mlp_out, stats = _mlp(mlp_in, bp, compute_dtype, nm, collect_mlp_stats,
                                  mlp_stats_kind, act=_glu_act(cfg))
        if collect_mlp_stats:
            out["mlp_stats"] = stats
        if collect_mlp_io_stats:
            # sumsq over tokens of the MLP module's input/output hidden dims
            # (reference get_mlp_inputs_outputs, src/utilities.py:290-319).
            out["mlp_in_stats"] = jnp.sum(jnp.square(mlp_in.astype(jnp.float32)), axis=1)
            out["mlp_out_stats"] = jnp.sum(jnp.square(mlp_out.astype(jnp.float32)), axis=1)
        if cfg.is_gemma2:
            mlp_out = rms_norm(mlp_out, bp["ln2_post"], cfg.rms_eps)
        x = x + mlp_out * gm.astype(x.dtype)
        if return_block_outputs:
            out["block_outputs"] = x
        return x, out

    scan_body = jax.checkpoint(body) if remat else body
    x, scanned_out = jax.lax.scan(scan_body, x, (params["blocks"], gates_a,
                                                 gates_m, nmask, wbounds))

    if cfg.is_phi or cfg.is_opt:
        x = _layer_norm(x, params["ln_final"], params["ln_final_bias"], cfg.layer_norm_eps)
    else:
        x = rms_norm(x, params["ln_final"], cfg.rms_eps)
    return _head_logits(params, x, compute_dtype, cfg.final_softcap), dict(scanned_out)


def _pick_variants(blocks, bases, idx):
    """Per-layer param dict copying whichever storage variant each base key
    has — shared ops.common helper (vit.py uses the same one)."""
    from ssp_x_vit_tpu.ops.common import pick_param_variants

    return pick_param_variants(blocks, bases, idx)


def llama_forward_materialized(
    params: Params,
    input_ids: jax.Array,
    cfg: LlamaConfig,
    *,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Unrolled forward for depth-materialized models (attention weights of
    pruned blocks physically absent; cf. vit_forward_materialized)."""
    if cfg.num_experts:
        raise ValueError(
            "MoE configs do not support depth materialization (2SSP depth "
            "pruning targets the dense block layout); this guard prevents "
            "the 4-D expert kernels from silently broadcasting through the "
            "dense _mlp contraction")
    x = _embed_tokens(params, input_ids, cfg, compute_dtype)
    if cfg.is_opt:
        pos = 2 + jnp.arange(input_ids.shape[1])
        x = x + params["pos_embed"].astype(compute_dtype)[pos][None]
    blocks = params["blocks"]
    store = cfg.attn_store_index

    for i in range(cfg.num_layers):
        j = store[i]
        if cfg.is_opt:
            # attention (incl. its pre-LN) removable; MLP block always present
            if j is not None:
                h = _layer_norm(x, blocks["ln1"][j], blocks["ln1_bias"][j],
                                cfg.layer_norm_eps)
                bp = _pick_variants(blocks, ("q_kernel", "k_kernel",
                                             "v_kernel", "o_kernel"), j)
                for k in ("q_bias", "k_bias", "v_bias", "o_bias"):
                    bp[k] = blocks[k][j]
                x = x + _attention(h, bp, cfg, compute_dtype)
            mlp_in = _layer_norm(x, blocks["ln2"][i], blocks["ln2_bias"][i],
                                 cfg.layer_norm_eps)
            mp = _pick_variants(blocks, ("fc1_kernel", "fc2_kernel"), i)
            mp["fc1_bias"], mp["fc2_bias"] = blocks["fc1_bias"][i], blocks["fc2_bias"][i]
            mlp_out, _ = _phi_mlp(mlp_in, mp, compute_dtype, None, False, act="relu")
            x = x + mlp_out
            continue
        if cfg.is_phi:
            # ln1 feeds both branches in phi, so it is indexed by the FULL
            # layer index (never removed with the attention; reference deletes
            # only q/k/v/dense, src/utilities.py:496-500).
            h = _layer_norm(x, blocks["ln1"][i], blocks["ln1_bias"][i], cfg.layer_norm_eps)
            delta = jnp.zeros_like(x)
            if j is not None:
                bp = _pick_variants(blocks, ("q_kernel", "k_kernel",
                                             "v_kernel", "o_kernel"), j)
                for k in ("q_bias", "k_bias", "v_bias", "o_bias"):
                    if k in blocks:
                        bp[k] = blocks[k][j]
                delta = _attention(h, bp, cfg, compute_dtype)
            mp = _pick_variants(blocks, ("fc1_kernel", "fc2_kernel"), i)
            mp["fc1_bias"], mp["fc2_bias"] = blocks["fc1_bias"][i], blocks["fc2_bias"][i]
            mlp_out, _ = _phi_mlp(h, mp, compute_dtype, None, False)
            x = x + delta + mlp_out
            continue
        if j is not None:
            bp = _pick_variants(blocks, ("q_kernel", "k_kernel",
                                         "v_kernel", "o_kernel"), j)
            bp["ln1"] = blocks["ln1"][j]
            for k in ("q_bias", "k_bias", "v_bias", "q_norm", "k_norm"):
                if k in blocks:
                    bp[k] = blocks[k][j]
            # unrolled layers: per-layer windows are STATIC here, so each
            # layer keeps its flash-capable static-window dispatch
            cfg_i = cfg
            if not cfg.uniform_window:
                cfg_i = dataclasses.replace(
                    cfg, window_layers=None,
                    sliding_window=(cfg.sliding_window
                                    if cfg.layer_window_bounds[i] < cfg._FULL_BOUND
                                    else None))
            attn_out = _attention(rms_norm(x, bp["ln1"], cfg.rms_eps), bp,
                                  cfg_i, compute_dtype)
            if cfg.is_gemma2:
                attn_out = rms_norm(attn_out, blocks["ln1_post"][j], cfg.rms_eps)
            x = x + attn_out
        mp = _pick_variants(blocks, ("gate_kernel", "up_kernel",
                                     "down_kernel"), i)
        mp["ln2"] = blocks["ln2"][i]
        mlp_out, _ = _mlp(rms_norm(x, mp["ln2"], cfg.rms_eps), mp, compute_dtype,
                          None, False, act=_glu_act(cfg))
        if cfg.is_gemma2:
            mlp_out = rms_norm(mlp_out, blocks["ln2_post"][i], cfg.rms_eps)
        x = x + mlp_out

    if cfg.is_phi or cfg.is_opt:
        x = _layer_norm(x, params["ln_final"], params["ln_final_bias"], cfg.layer_norm_eps)
    else:
        x = rms_norm(x, params["ln_final"], cfg.rms_eps)
    return _head_logits(params, x, compute_dtype, cfg.final_softcap)
