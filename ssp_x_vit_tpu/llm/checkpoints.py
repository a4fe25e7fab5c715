"""HF causal-LM checkpoint loading (Llama-2 / Mistral / Qwen2)
(replaces reference loadModel, src/utilities.py:32-54).

Local-directory only (zero-egress): reads config.json + *.safetensors shards
with the numpy safetensors reader from models/checkpoints.py; no torch needed.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params
from ssp_x_vit_tpu.llm.rope import (RopeScaling, export_rope_scaling,
                                    parse_rope_scaling)
from ssp_x_vit_tpu.models.checkpoints import _read_safetensors, _t


def config_from_hf_dict(d: Dict[str, Any]) -> LlamaConfig:
    mt = d.get("model_type", "llama")
    if mt not in ("llama", "mistral", "qwen2", "phi3", "phi", "opt", "gemma",
                  "gemma2", "mixtral", "qwen3", "qwen3_moe"):
        raise ValueError(f"unsupported model_type {mt}")
    heads = d["num_attention_heads"]
    head_dim = d.get("head_dim", d["hidden_size"] // heads)
    rotary_dim = None
    if mt == "phi":
        rotary_dim = int(d.get("partial_rotary_factor", 0.4) * head_dim)
    if mt == "opt":
        # 125m-class layout only: pre-LN, no embed projection (the 350m
        # project_in/out variant is out of scope, as in the reference CLI)
        if not d.get("do_layer_norm_before", True):
            raise ValueError("post-LN OPT variants unsupported")
        if d.get("word_embed_proj_dim", d["hidden_size"]) != d["hidden_size"]:
            raise ValueError("OPT word_embed_proj_dim != hidden_size unsupported")
        return LlamaConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=heads,
            intermediate_size=d["ffn_dim"],
            tie_embeddings=d.get("tie_word_embeddings", True),
            model_type="opt",
            qkv_bias=d.get("enable_bias", True),
            layer_norm_eps=1e-5,
            max_position_embeddings=d.get("max_position_embeddings", 2048),
        )
    # Sliding window per HF semantics. mistral and phi3 apply
    # ``sliding_window`` unconditionally when set (modeling_mistral,
    # modeling_phi3). qwen2 ships the field but honors it only under
    # ``use_sliding_window``, and then only for layers with
    # layer_idx >= max_window_layers (the first max_window_layers layers run
    # FULL attention — Qwen2Config docs); the shipped Qwen2 checkpoints set
    # max_window_layers == num_hidden_layers, i.e. no layer is windowed.
    # This config is one window for ALL layers, so the mixed per-layer case
    # is refused rather than silently mis-masked.
    sliding_window, window_layers = None, None
    if d.get("sliding_window") is not None:
        if mt in ("mistral", "phi3", "mixtral"):
            sliding_window = d["sliding_window"]
        elif mt in ("qwen2", "qwen3", "qwen3_moe") and d.get(
                "use_sliding_window", False):
            # HF Qwen2: the FIRST max_window_layers layers run full
            # attention; layers past that use the window (Qwen2Config docs;
            # shipped checkpoints set mwl == num_layers, windowing nothing).
            mwl = d.get("max_window_layers", d["num_hidden_layers"])
            L = d["num_hidden_layers"]
            if mwl < L:
                sliding_window = d["sliding_window"]
                if mwl > 0:  # genuinely mixed: per-layer bounds path
                    window_layers = tuple(range(mwl, L))
        elif mt == "gemma2":
            # HF Gemma2: EVEN layers slide, odd layers run full attention
            sliding_window = d["sliding_window"]
            window_layers = tuple(range(0, d["num_hidden_layers"], 2))
    num_experts, moe_top_k, aux_coef = 0, 1, 0.01
    intermediate = d["intermediate_size"]
    if mt == "qwen3_moe":
        # HF Qwen3Moe: softmax -> top-k -> renormalize (norm_topk_prob=True,
        # the shipped-checkpoint setting) == the dropless top-k gate. The
        # expert MLP width is moe_intermediate_size; dense-MLP interleaving
        # (decoder_sparse_step > 1, mlp_only_layers) has no counterpart in
        # the uniform stacked-block layout and is refused.
        if not d.get("norm_topk_prob", True):
            raise ValueError("qwen3_moe with norm_topk_prob=False keeps "
                             "un-renormalized gates; the dropless top-k "
                             "path here renormalizes — refusing instead of "
                             "silently diverging")
        if d.get("decoder_sparse_step", 1) != 1 or d.get("mlp_only_layers"):
            raise ValueError("qwen3_moe with dense-MLP layers interleaved "
                             "(decoder_sparse_step/mlp_only_layers) is not "
                             "representable in the uniform MoE block stack")
        num_experts = d["num_experts"]
        moe_top_k = d.get("num_experts_per_tok", 8)
        aux_coef = d.get("router_aux_loss_coef", 0.001)
        intermediate = d["moe_intermediate_size"]
    if mt == "mixtral":
        # HF MixtralSparseMoeBlock: softmax over ALL experts -> top-k ->
        # renormalize over the selected k — exactly the dropless top-k gate
        # in parallel/moe.py. top-1 mixtral would renormalize to a UNIT
        # gate where our switch path keeps the raw probability; no shipped
        # checkpoint uses it, so it is refused rather than silently off.
        num_experts = d["num_local_experts"]
        moe_top_k = d.get("num_experts_per_tok", 2)
        aux_coef = d.get("router_aux_loss_coef", 0.02)
        if moe_top_k < 2:
            raise ValueError(
                "mixtral with num_experts_per_tok=1 renormalizes the single "
                "gate to 1.0 (HF semantics); the switch-MoE path here keeps "
                "the raw router probability — refusing instead of silently "
                "diverging")
    return LlamaConfig(
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        num_layers=d["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=d.get("num_key_value_heads", heads),
        intermediate_size=intermediate,
        num_experts=num_experts,
        moe_top_k=moe_top_k,
        router_aux_coef=aux_coef,
        rms_eps=d.get("rms_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        # llama-3.1 "llama3" / YaRN / linear scaling (llm/rope.py); phi's
        # partial-rotary HF config carries no rope_scaling in scope here
        rope_scaling=parse_rope_scaling(d.get("rope_scaling")),
        tie_embeddings=d.get("tie_word_embeddings",
                             mt in ("gemma", "gemma2")),
        model_type=mt,
        # not used by the RoPE forward (lengths are per-call static), but
        # carried so export_hf_llama round-trips the context limit instead of
        # letting transformers default it (llama: 2048)
        max_position_embeddings=d.get("max_position_embeddings", 2048),
        sliding_window=sliding_window,
        qkv_bias=(mt == "qwen2" or (mt in ("qwen3", "qwen3_moe")
                                    and d.get("attention_bias", False))),
        rotary_dim=rotary_dim,
        layer_norm_eps=d.get("layer_norm_eps", 1e-5),
        # gemma: explicit head_dim (7B: 256 != hidden/heads), tanh-gelu GLU
        # (HF resolves hidden_activation to gelu_pytorch_tanh), sqrt(d)
        # embedding scale, always-tied head. qwen3 also ships an explicit
        # head_dim (0.6B: 128 != 1024/16).
        explicit_head_dim=(d.get("head_dim")
                           if mt in ("gemma", "gemma2", "qwen3", "qwen3_moe")
                           else None),
        # qwen3(+moe): per-head RMSNorm on q/k before rope
        qk_norm=(mt in ("qwen3", "qwen3_moe")),
        hidden_act=("gelu_tanh" if mt in ("gemma", "gemma2") else "silu"),
        scale_embeddings=(mt in ("gemma", "gemma2")),
        window_layers=window_layers,
        attn_softcap=(d.get("attn_logit_softcapping", 50.0)
                      if mt == "gemma2" else None),
        final_softcap=(d.get("final_logit_softcapping", 30.0)
                       if mt == "gemma2" else None),
    )


# HF MoE naming per model_type: (submodule, ((our key, their proj), ...))
_MOE_NAMES = {
    "mixtral": ("block_sparse_moe", (("gate_kernel", "w1"),
                                     ("up_kernel", "w3"),
                                     ("down_kernel", "w2"))),
    "qwen3_moe": ("mlp", (("gate_kernel", "gate_proj"),
                          ("up_kernel", "up_proj"),
                          ("down_kernel", "down_proj"))),
}


def load_hf_llama(model_dir: str, dtype=jnp.bfloat16) -> Tuple[Params, LlamaConfig]:
    with open(os.path.join(model_dir, "config.json")) as f:
        raw_cfg = json.load(f)
    cfg = config_from_hf_dict(raw_cfg)

    sd: Dict[str, np.ndarray] = {}
    shards = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not shards:
        raise FileNotFoundError(f"no safetensors shards in {model_dir}")
    for shard in shards:
        sd.update(_read_safetensors(shard))

    L = cfg.num_layers

    def g(key):
        return np.asarray(sd[key], np.float32)

    def stack(fmt, transform=lambda x: x):
        return np.stack([transform(g(fmt.format(i=i))) for i in range(L)])

    if cfg.model_type == "opt":
        # OPT decoder layout (reference adapters/opt_adapter.py; HF
        # OPTForCausalLM): sequential pre-LN, learned positions (offset 2),
        # ReLU fc MLP, tied head.
        pre = "model.decoder.layers.{i}"
        blocks = {
            "ln1": stack(pre + ".self_attn_layer_norm.weight"),
            "ln1_bias": stack(pre + ".self_attn_layer_norm.bias"),
            "q_kernel": stack(pre + ".self_attn.q_proj.weight", _t),
            "q_bias": stack(pre + ".self_attn.q_proj.bias"),
            "k_kernel": stack(pre + ".self_attn.k_proj.weight", _t),
            "k_bias": stack(pre + ".self_attn.k_proj.bias"),
            "v_kernel": stack(pre + ".self_attn.v_proj.weight", _t),
            "v_bias": stack(pre + ".self_attn.v_proj.bias"),
            "o_kernel": stack(pre + ".self_attn.out_proj.weight", _t),
            "o_bias": stack(pre + ".self_attn.out_proj.bias"),
            "ln2": stack(pre + ".final_layer_norm.weight"),
            "ln2_bias": stack(pre + ".final_layer_norm.bias"),
            "fc1_kernel": stack(pre + ".fc1.weight", _t),
            "fc1_bias": stack(pre + ".fc1.bias"),
            "fc2_kernel": stack(pre + ".fc2.weight", _t),
            "fc2_bias": stack(pre + ".fc2.bias"),
        }
        params: Params = {
            "embed": jnp.asarray(g("model.decoder.embed_tokens.weight"), dtype),
            "pos_embed": jnp.asarray(g("model.decoder.embed_positions.weight"), dtype),
            "blocks": {k: jnp.asarray(v, dtype) for k, v in blocks.items()},
            "ln_final": jnp.asarray(g("model.decoder.final_layer_norm.weight"), dtype),
            "ln_final_bias": jnp.asarray(g("model.decoder.final_layer_norm.bias"), dtype),
        }
        if not cfg.tie_embeddings and "lm_head.weight" in sd:
            params["lm_head"] = jnp.asarray(_t(g("lm_head.weight")), dtype)
        return params, cfg

    if cfg.model_type == "phi":
        # phi-2 layout: parallel block, fc1/fc2 GELU MLP, dense out proj, all
        # biased, LayerNorm (reference model family, src/utilities.py:358-373)
        blocks = {
            "ln1": stack("model.layers.{i}.input_layernorm.weight"),
            "ln1_bias": stack("model.layers.{i}.input_layernorm.bias"),
            "q_kernel": stack("model.layers.{i}.self_attn.q_proj.weight", _t),
            "q_bias": stack("model.layers.{i}.self_attn.q_proj.bias"),
            "k_kernel": stack("model.layers.{i}.self_attn.k_proj.weight", _t),
            "k_bias": stack("model.layers.{i}.self_attn.k_proj.bias"),
            "v_kernel": stack("model.layers.{i}.self_attn.v_proj.weight", _t),
            "v_bias": stack("model.layers.{i}.self_attn.v_proj.bias"),
            "o_kernel": stack("model.layers.{i}.self_attn.dense.weight", _t),
            "o_bias": stack("model.layers.{i}.self_attn.dense.bias"),
            "fc1_kernel": stack("model.layers.{i}.mlp.fc1.weight", _t),
            "fc1_bias": stack("model.layers.{i}.mlp.fc1.bias"),
            "fc2_kernel": stack("model.layers.{i}.mlp.fc2.weight", _t),
            "fc2_bias": stack("model.layers.{i}.mlp.fc2.bias"),
        }
        params: Params = {
            "embed": jnp.asarray(g("model.embed_tokens.weight"), dtype),
            "blocks": {k: jnp.asarray(v, dtype) for k, v in blocks.items()},
            "ln_final": jnp.asarray(g("model.final_layernorm.weight"), dtype),
            "ln_final_bias": jnp.asarray(g("model.final_layernorm.bias"), dtype),
            "lm_head": jnp.asarray(_t(g("lm_head.weight")), dtype),
            "lm_head_bias": jnp.asarray(g("lm_head.bias"), dtype),
        }
        return params, cfg

    if cfg.model_type == "phi3":
        # phi-3 fuses qkv_proj [hq+2hkv, d] and gate_up_proj [2f, d]
        # (reference prune_mlp chunks gate_up, src/utilities.py:409-418);
        # the loader splits them into the unified layout once.
        hq = cfg.num_heads * cfg.head_dim
        hkv = cfg.num_kv_heads * cfg.head_dim
        q_l, k_l, v_l, g_l, u_l = [], [], [], [], []
        for i in range(L):
            qkv = _t(g(f"model.layers.{i}.self_attn.qkv_proj.weight"))  # [d, hq+2hkv]
            q_l.append(qkv[:, :hq])
            k_l.append(qkv[:, hq : hq + hkv])
            v_l.append(qkv[:, hq + hkv :])
            gu = _t(g(f"model.layers.{i}.mlp.gate_up_proj.weight"))  # [d, 2f]
            g_l.append(gu[:, : cfg.intermediate_size])
            u_l.append(gu[:, cfg.intermediate_size :])
        blocks = {
            "ln1": stack("model.layers.{i}.input_layernorm.weight"),
            "q_kernel": np.stack(q_l),
            "k_kernel": np.stack(k_l),
            "v_kernel": np.stack(v_l),
            "o_kernel": stack("model.layers.{i}.self_attn.o_proj.weight", _t),
            "ln2": stack("model.layers.{i}.post_attention_layernorm.weight"),
            "gate_kernel": np.stack(g_l),
            "up_kernel": np.stack(u_l),
            "down_kernel": stack("model.layers.{i}.mlp.down_proj.weight", _t),
        }
        params = {
            "embed": jnp.asarray(g("model.embed_tokens.weight"), dtype),
            "blocks": {k: jnp.asarray(v, dtype) for k, v in blocks.items()},
            "ln_final": jnp.asarray(g("model.norm.weight"), dtype),
        }
        if not cfg.tie_embeddings and "lm_head.weight" in sd:
            params["lm_head"] = jnp.asarray(_t(g("lm_head.weight")), dtype)
        import dataclasses as _dc

        return params, _dc.replace(cfg, model_type="llama")

    blocks = {
        "ln1": stack("model.layers.{i}.input_layernorm.weight"),
        "q_kernel": stack("model.layers.{i}.self_attn.q_proj.weight", _t),
        "k_kernel": stack("model.layers.{i}.self_attn.k_proj.weight", _t),
        "v_kernel": stack("model.layers.{i}.self_attn.v_proj.weight", _t),
        "o_kernel": stack("model.layers.{i}.self_attn.o_proj.weight", _t),
    }
    if cfg.num_experts:
        # HF sparse-MoE blocks -> the MoE param contract of parallel/moe.py:
        # router [L, d, E], expert-stacked SwiGLU kernels [L, E, d, f] /
        # [L, E, f, d]. Mixtral names the submodule block_sparse_moe with
        # w1/w3/w2 expert projections (torch Linear weights are [out, in]);
        # qwen3_moe uses mlp with gate/up/down_proj.
        moe_pre, names = _MOE_NAMES[cfg.model_type]
        E = cfg.num_experts
        blocks["router"] = stack(
            "model.layers.{i}." + moe_pre + ".gate.weight", _t)
        for ours, theirs in names:
            blocks[ours] = np.stack([
                np.stack([_t(g(f"model.layers.{i}.{moe_pre}."
                              f"experts.{e}.{theirs}.weight"))
                          for e in range(E)]) for i in range(L)])
    else:
        blocks.update({
            "gate_kernel": stack("model.layers.{i}.mlp.gate_proj.weight", _t),
            "up_kernel": stack("model.layers.{i}.mlp.up_proj.weight", _t),
            "down_kernel": stack("model.layers.{i}.mlp.down_proj.weight", _t),
        })
    if cfg.model_type == "gemma2":
        # gemma-2's four norms: ln2 here = PRE-feedforward (keeps MLP call
        # sites uniform); post-norms are new keys
        blocks["ln1_post"] = stack(
            "model.layers.{i}.post_attention_layernorm.weight")
        blocks["ln2"] = stack(
            "model.layers.{i}.pre_feedforward_layernorm.weight")
        blocks["ln2_post"] = stack(
            "model.layers.{i}.post_feedforward_layernorm.weight")
        # fold the query_pre_attn_scalar attention scale into q_proj: the
        # standard paths divide by sqrt(head_dim), gemma-2 wants
        # qps**-0.5 — one multiplicative constant on q, exact
        qps = float(raw_cfg.get("query_pre_attn_scalar", cfg.head_dim))
        blocks["q_kernel"] = blocks["q_kernel"] * float(
            cfg.head_dim ** 0.5 / qps ** 0.5)
    else:
        blocks["ln2"] = stack(
            "model.layers.{i}.post_attention_layernorm.weight")
    if cfg.qkv_bias:
        blocks["q_bias"] = stack("model.layers.{i}.self_attn.q_proj.bias")
        blocks["k_bias"] = stack("model.layers.{i}.self_attn.k_proj.bias")
        blocks["v_bias"] = stack("model.layers.{i}.self_attn.v_proj.bias")
    if cfg.qk_norm:
        blocks["q_norm"] = stack("model.layers.{i}.self_attn.q_norm.weight")
        blocks["k_norm"] = stack("model.layers.{i}.self_attn.k_norm.weight")

    if cfg.model_type in ("gemma", "gemma2"):
        # Gemma(2)RMSNorm scales by (1 + weight): bake the +1 into the
        # stored scales so every rms_norm call site stays the standard form.
        for k in ("ln1", "ln2", "ln1_post", "ln2_post"):
            if k in blocks:
                blocks[k] = blocks[k] + 1.0
    params: Params = {
        "embed": jnp.asarray(g("model.embed_tokens.weight"), dtype),
        "blocks": {k: jnp.asarray(v, dtype) for k, v in blocks.items()},
        "ln_final": jnp.asarray(
            g("model.norm.weight")
            + (1.0 if cfg.model_type in ("gemma", "gemma2") else 0.0),
            dtype),
    }
    if not cfg.tie_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(_t(g("lm_head.weight")), dtype)
    return params, cfg


def hf_dict_from_config(cfg: LlamaConfig) -> Dict[str, Any]:
    """Inverse of ``config_from_hf_dict``: an HF config.json dict that
    ``transformers`` AutoModelForCausalLM loads (per-arch model_type)."""
    if cfg.is_opt:
        return {
            "model_type": "opt", "architectures": ["OPTForCausalLM"],
            "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads, "ffn_dim": cfg.intermediate_size,
            "max_position_embeddings": cfg.max_position_embeddings,
            "do_layer_norm_before": True, "enable_bias": True,
            "word_embed_proj_dim": cfg.hidden_size,
            "tie_word_embeddings": cfg.tie_embeddings,
            "activation_function": "relu",
        }
    if cfg.is_phi:
        return {
            "model_type": "phi", "architectures": ["PhiForCausalLM"],
            "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "intermediate_size": cfg.effective_intermediate,
            "partial_rotary_factor": (cfg.rotary_dim or cfg.head_dim) / cfg.head_dim,
            "rope_theta": cfg.rope_theta,
            "layer_norm_eps": cfg.layer_norm_eps,
            "tie_word_embeddings": False,
            "hidden_act": "gelu_new",
            **({"rope_scaling": export_rope_scaling(cfg.rope_scaling)}
               if cfg.rope_scaling is not None else {}),
        }
    d: Dict[str, Any] = {
        "model_type": cfg.model_type,
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "intermediate_size": cfg.effective_intermediate,
        "rms_norm_eps": cfg.rms_eps, "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_embeddings,
        "max_position_embeddings": cfg.max_position_embeddings,
    }
    if cfg.rope_scaling is not None:
        d["rope_scaling"] = export_rope_scaling(cfg.rope_scaling)
    arch = {"llama": "LlamaForCausalLM", "mistral": "MistralForCausalLM",
            "qwen2": "Qwen2ForCausalLM", "gemma": "GemmaForCausalLM",
            "gemma2": "Gemma2ForCausalLM",
            "mixtral": "MixtralForCausalLM",
            "qwen3": "Qwen3ForCausalLM",
            "qwen3_moe": "Qwen3MoeForCausalLM"}.get(cfg.model_type)
    if arch is None:
        # phi3 configs normalize to llama layout inside load_hf_llama; a
        # still-phi3-typed config never paired with loaded weights
        raise ValueError(f"model_type {cfg.model_type!r} has no HF export "
                         "encoding (phi3 loads normalize to llama layout)")
    d["architectures"] = [arch]
    if cfg.model_type == "mixtral":
        d["num_local_experts"] = cfg.num_experts
        d["num_experts_per_tok"] = cfg.moe_top_k
        d["router_aux_loss_coef"] = cfg.router_aux_coef
    if cfg.model_type in ("qwen3", "qwen3_moe"):
        d["head_dim"] = cfg.head_dim
        d["attention_bias"] = cfg.qkv_bias
    if cfg.model_type == "qwen3_moe":
        d["num_experts"] = cfg.num_experts
        d["num_experts_per_tok"] = cfg.moe_top_k
        d["router_aux_loss_coef"] = cfg.router_aux_coef
        d["norm_topk_prob"] = True
        d["decoder_sparse_step"] = 1
        d["mlp_only_layers"] = []
        # the loader mapped moe_intermediate_size onto intermediate_size;
        # the dense fallback width is unused (every layer is sparse)
        d["moe_intermediate_size"] = cfg.effective_intermediate
    if cfg.model_type in ("gemma", "gemma2"):
        d["head_dim"] = cfg.head_dim
        d["hidden_activation"] = "gelu_pytorch_tanh"
    if cfg.model_type == "gemma2":
        # the loader folded query_pre_attn_scalar into q_proj; the exported
        # (folded) weights are exact under qps == head_dim
        d["query_pre_attn_scalar"] = cfg.head_dim
        d["attn_logit_softcapping"] = cfg.attn_softcap
        d["final_logit_softcapping"] = cfg.final_softcap
        d["sliding_window"] = cfg.sliding_window
        if cfg.sliding_window is not None and cfg.window_layers != tuple(
                range(0, cfg.num_layers, 2)):
            raise ValueError(
                "HF gemma-2 windows even layers only; this config's "
                f"window_layers {cfg.window_layers} cannot round-trip")
    elif cfg.sliding_window is None:
        if cfg.model_type == "mistral":
            # MistralConfig DEFAULTS sliding_window to 4096 when the key is
            # absent — write the null explicitly or transformers applies a
            # window the source model never had
            d["sliding_window"] = None
    else:
        if cfg.model_type in ("mistral", "mixtral") and cfg.uniform_window:
            d["sliding_window"] = cfg.sliding_window
        elif cfg.model_type == "qwen2":
            wl = cfg.window_layers
            if wl is not None and wl != tuple(range(min(wl), cfg.num_layers)):
                raise ValueError(
                    f"qwen2 window_layers {wl} is not a [mwl, L) suffix — "
                    "not representable as max_window_layers")
            d["use_sliding_window"] = True
            d["sliding_window"] = cfg.sliding_window
            d["max_window_layers"] = min(wl) if wl else 0
        else:
            raise ValueError(
                f"{cfg.model_type} with sliding_window has no HF encoding")
    return d


def export_hf_llama(out_dir: str, params: Params, cfg: LlamaConfig) -> str:
    """Export a (dense or width-pruned-materialized) LLM pytree as an HF
    checkpoint: ``config.json`` + ``model.safetensors`` that transformers
    ``AutoModelForCausalLM.from_pretrained`` loads with identical logits.

    The reference ships pruned models back out with ``save_pretrained``
    (src/pruning.py:286-290, experiments save paths); this is the TPU-native
    counterpart, inverting ``load_hf_llama`` (kernels transposed back to
    [out, in], gemma's (1+w) RMS bake removed, gemma-2 exported with the
    folded q_proj under query_pre_attn_scalar == head_dim — byte-different
    from an original HF checkpoint but logit-exact). Refused: quantized
    pytrees (int8/int4 codes have no HF encoding — export the dense pytree
    and re-quantize on load), MoE (our stacked expert layout), and
    depth-materialized attention removal (vanilla HF blocks cannot skip
    attention; use save_llm_model for native serving artifacts).
    """
    from ssp_x_vit_tpu.models.checkpoints import _write_safetensors

    blocks = params["blocks"]
    if any(k.endswith(("_q", "_q4", "_scale")) for k in blocks) or \
            "lm_head_q" in params:
        raise ValueError("quantized pytrees have no HF encoding — export the "
                         "dense params and quantize after from_pretrained")
    if cfg.num_experts and cfg.model_type not in _MOE_NAMES:
        raise ValueError("MoE export to HF needs an HF MoE layout "
                         "(model_type 'mixtral' or 'qwen3_moe'); native "
                         "MoE-llama configs use save_llm_model")
    if cfg.pruned_attention_blocks:
        raise ValueError("depth-materialized attention removal is not "
                         "representable in vanilla HF blocks; use "
                         "save_llm_model")
    # Validate the config encoding BEFORE any writes: every refusal
    # (phi3-typed, non-even gemma-2 windows, non-suffix qwen2 windows, mixed
    # mistral) must leave no partial out_dir behind.
    hf_cfg = hf_dict_from_config(cfg)
    os.makedirs(out_dir, exist_ok=True)
    L = cfg.num_layers

    def u(key, i, transform=lambda x: x):
        return np.ascontiguousarray(
            transform(np.asarray(blocks[key][i], np.float32)))

    tensors: Dict[str, np.ndarray] = {}
    if cfg.is_opt:
        pre = "model.decoder.layers.{i}"
        names = [("ln1", ".self_attn_layer_norm.weight", False),
                 ("ln1_bias", ".self_attn_layer_norm.bias", False),
                 ("q_kernel", ".self_attn.q_proj.weight", True),
                 ("q_bias", ".self_attn.q_proj.bias", False),
                 ("k_kernel", ".self_attn.k_proj.weight", True),
                 ("k_bias", ".self_attn.k_proj.bias", False),
                 ("v_kernel", ".self_attn.v_proj.weight", True),
                 ("v_bias", ".self_attn.v_proj.bias", False),
                 ("o_kernel", ".self_attn.out_proj.weight", True),
                 ("o_bias", ".self_attn.out_proj.bias", False),
                 ("ln2", ".final_layer_norm.weight", False),
                 ("ln2_bias", ".final_layer_norm.bias", False),
                 ("fc1_kernel", ".fc1.weight", True),
                 ("fc1_bias", ".fc1.bias", False),
                 ("fc2_kernel", ".fc2.weight", True),
                 ("fc2_bias", ".fc2.bias", False)]
        for i in range(L):
            for key, suffix, tr in names:
                tensors[pre.format(i=i) + suffix] = u(key, i, _t if tr else
                                                      (lambda x: x))
        tensors["model.decoder.embed_tokens.weight"] = np.asarray(
            params["embed"], np.float32)
        tensors["model.decoder.embed_positions.weight"] = np.asarray(
            params["pos_embed"], np.float32)
        tensors["model.decoder.final_layer_norm.weight"] = np.asarray(
            params["ln_final"], np.float32)
        tensors["model.decoder.final_layer_norm.bias"] = np.asarray(
            params["ln_final_bias"], np.float32)
        if not cfg.tie_embeddings and "lm_head" in params:
            tensors["lm_head.weight"] = np.ascontiguousarray(
                _t(np.asarray(params["lm_head"], np.float32)))
    elif cfg.is_phi:
        names = [("ln1", "input_layernorm.weight", False),
                 ("ln1_bias", "input_layernorm.bias", False),
                 ("q_kernel", "self_attn.q_proj.weight", True),
                 ("q_bias", "self_attn.q_proj.bias", False),
                 ("k_kernel", "self_attn.k_proj.weight", True),
                 ("k_bias", "self_attn.k_proj.bias", False),
                 ("v_kernel", "self_attn.v_proj.weight", True),
                 ("v_bias", "self_attn.v_proj.bias", False),
                 ("o_kernel", "self_attn.dense.weight", True),
                 ("o_bias", "self_attn.dense.bias", False),
                 ("fc1_kernel", "mlp.fc1.weight", True),
                 ("fc1_bias", "mlp.fc1.bias", False),
                 ("fc2_kernel", "mlp.fc2.weight", True),
                 ("fc2_bias", "mlp.fc2.bias", False)]
        for i in range(L):
            for key, suffix, tr in names:
                tensors[f"model.layers.{i}.{suffix}"] = u(
                    key, i, _t if tr else (lambda x: x))
        tensors["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
        tensors["model.final_layernorm.weight"] = np.asarray(params["ln_final"], np.float32)
        tensors["model.final_layernorm.bias"] = np.asarray(params["ln_final_bias"], np.float32)
        tensors["lm_head.weight"] = np.ascontiguousarray(
            _t(np.asarray(params["lm_head"], np.float32)))
        tensors["lm_head.bias"] = np.asarray(params["lm_head_bias"], np.float32)
    else:
        gemma = cfg.model_type in ("gemma", "gemma2")
        unbake = (lambda x: x - 1.0) if gemma else (lambda x: x)
        names = [("ln1", "input_layernorm.weight", unbake),
                 ("q_kernel", "self_attn.q_proj.weight", _t),
                 ("k_kernel", "self_attn.k_proj.weight", _t),
                 ("v_kernel", "self_attn.v_proj.weight", _t),
                 ("o_kernel", "self_attn.o_proj.weight", _t)]
        if cfg.num_experts:
            # inverse of the loader's expert stacking: router back to
            # [E, d], per-expert projections back to [out, in]
            moe_pre, moe_names = _MOE_NAMES[cfg.model_type]
            for i in range(L):
                tensors[f"model.layers.{i}.{moe_pre}.gate.weight"] = \
                    u("router", i, _t)
                for ours, theirs in moe_names:
                    for e in range(cfg.num_experts):
                        tensors[f"model.layers.{i}.{moe_pre}."
                                f"experts.{e}.{theirs}.weight"] = \
                            np.ascontiguousarray(_t(np.asarray(
                                blocks[ours][i, e], np.float32)))
        else:
            names += [("gate_kernel", "mlp.gate_proj.weight", _t),
                      ("up_kernel", "mlp.up_proj.weight", _t),
                      ("down_kernel", "mlp.down_proj.weight", _t)]
        if cfg.is_gemma2:
            names += [("ln1_post", "post_attention_layernorm.weight", unbake),
                      ("ln2", "pre_feedforward_layernorm.weight", unbake),
                      ("ln2_post", "post_feedforward_layernorm.weight", unbake)]
        else:
            names.append(("ln2", "post_attention_layernorm.weight", unbake))
        if cfg.qkv_bias:
            names += [("q_bias", "self_attn.q_proj.bias", lambda x: x),
                      ("k_bias", "self_attn.k_proj.bias", lambda x: x),
                      ("v_bias", "self_attn.v_proj.bias", lambda x: x)]
        if cfg.qk_norm:
            names += [("q_norm", "self_attn.q_norm.weight", lambda x: x),
                      ("k_norm", "self_attn.k_norm.weight", lambda x: x)]
        for i in range(L):
            for key, suffix, tr in names:
                tensors[f"model.layers.{i}.{suffix}"] = u(key, i, tr)
        tensors["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
        tensors["model.norm.weight"] = np.ascontiguousarray(
            np.asarray(params["ln_final"], np.float32) - (1.0 if gemma else 0.0))
        if not cfg.tie_embeddings and "lm_head" in params:
            tensors["lm_head.weight"] = np.ascontiguousarray(
                _t(np.asarray(params["lm_head"], np.float32)))

    _write_safetensors(os.path.join(out_dir, "model.safetensors"), tensors,
                       metadata={"format": "pt"})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return out_dir


def save_llm_model(out_dir: str, params: Params, cfg: LlamaConfig) -> str:
    """Persist an LLM (dense, 2SSP-materialized, or int8/int4-quantized
    pytree) as model.npz + config.json — the serving-deployment artifact
    (cf. models/persistence.py for the ViT side; the reference's
    save_pretrained covers only HF-layout dense/pruned torch models)."""
    import dataclasses
    import json
    import os

    from ssp_x_vit_tpu.models.checkpoints import save_params_npz

    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(os.path.join(out_dir, "model.npz"), params)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    return out_dir


def load_llm_model(model_dir: str, dtype=jnp.bfloat16) -> Tuple[Params, LlamaConfig]:
    """Inverse of save_llm_model. ``dtype`` applies to float leaves only —
    int8 codes keep their dtype (quantized models round-trip losslessly)."""
    import json
    import os

    from ssp_x_vit_tpu.models.checkpoints import load_params_npz

    with open(os.path.join(model_dir, "config.json")) as f:
        d = json.load(f)
    # JSON turns every tuple field (pruned_attention_blocks, window_layers,
    # ...) into a list; lists make the frozen config unhashable, which breaks
    # every jit with static_argnames=("cfg",). Restore tuples generically.
    for k, v in d.items():
        if isinstance(v, list):
            d[k] = tuple(v)
    # asdict() flattened the nested frozen RopeScaling into a plain dict
    if isinstance(d.get("rope_scaling"), dict):
        d["rope_scaling"] = RopeScaling(**d["rope_scaling"])
    cfg = LlamaConfig(**d)
    params = load_params_npz(os.path.join(model_dir, "model.npz"), dtype=dtype)
    return params, cfg
