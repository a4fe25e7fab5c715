"""HF causal-LM checkpoint loading (Llama-2 / Mistral / Qwen2)
(replaces reference loadModel, src/utilities.py:32-54).

Local-directory only (zero-egress): reads config.json + *.safetensors shards
with the numpy safetensors reader from models/checkpoints.py; no torch needed.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params
from ssp_x_vit_tpu.models.checkpoints import _read_safetensors, _t


def config_from_hf_dict(d: Dict[str, Any]) -> LlamaConfig:
    mt = d.get("model_type", "llama")
    if mt not in ("llama", "mistral", "qwen2"):
        raise ValueError(f"unsupported model_type {mt} (llama/mistral/qwen2 share the "
                         "block layout; phi/phi3 require the fc/fused-gate variants)")
    return LlamaConfig(
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        num_layers=d["num_hidden_layers"],
        num_heads=d["num_attention_heads"],
        num_kv_heads=d.get("num_key_value_heads", d["num_attention_heads"]),
        intermediate_size=d["intermediate_size"],
        rms_eps=d.get("rms_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        tie_embeddings=d.get("tie_word_embeddings", False),
        model_type=mt,
        qkv_bias=(mt == "qwen2"),
    )


def load_hf_llama(model_dir: str, dtype=jnp.bfloat16) -> Tuple[Params, LlamaConfig]:
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = config_from_hf_dict(json.load(f))

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

    blocks = {
        "ln1": stack("model.layers.{i}.input_layernorm.weight"),
        "q_kernel": stack("model.layers.{i}.self_attn.q_proj.weight", _t),
        "k_kernel": stack("model.layers.{i}.self_attn.k_proj.weight", _t),
        "v_kernel": stack("model.layers.{i}.self_attn.v_proj.weight", _t),
        "o_kernel": stack("model.layers.{i}.self_attn.o_proj.weight", _t),
        "ln2": stack("model.layers.{i}.post_attention_layernorm.weight"),
        "gate_kernel": stack("model.layers.{i}.mlp.gate_proj.weight", _t),
        "up_kernel": stack("model.layers.{i}.mlp.up_proj.weight", _t),
        "down_kernel": stack("model.layers.{i}.mlp.down_proj.weight", _t),
    }
    if cfg.qkv_bias:
        blocks["q_bias"] = stack("model.layers.{i}.self_attn.q_proj.bias")
        blocks["k_bias"] = stack("model.layers.{i}.self_attn.k_proj.bias")
        blocks["v_bias"] = stack("model.layers.{i}.self_attn.v_proj.bias")

    params: Params = {
        "embed": jnp.asarray(g("model.embed_tokens.weight"), dtype),
        "blocks": {k: jnp.asarray(v, dtype) for k, v in blocks.items()},
        "ln_final": jnp.asarray(g("model.norm.weight"), dtype),
    }
    if not cfg.tie_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(_t(g("lm_head.weight")), dtype)
    return params, cfg
