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
    """PartitionSpec pytree matching init_llama_params' structure.

    Stacked block arrays have a leading layer axis (never sharded).
    """
    blocks = {
        "ln1": P(None, None),
        "q_kernel": P(None, None, "model"),
        "k_kernel": P(None, None, "model"),
        "v_kernel": P(None, None, "model"),
        "o_kernel": P(None, "model", None),   # row-parallel -> psum on output
        "ln2": P(None, None),
        "gate_kernel": P(None, None, "model"),
        "up_kernel": P(None, None, "model"),
        "down_kernel": P(None, "model", None),
    }
    if cfg.qkv_bias:
        blocks.update(q_bias=P(None, "model"), k_bias=P(None, "model"),
                      v_bias=P(None, "model"))
    specs: Dict[str, Any] = {
        "embed": P(None, None),       # replicated (gather-free token lookup)
        "blocks": blocks,
        "ln_final": P(None),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, "model")  # vocab-sharded logits
    return specs


def shard_llama_params(params: Params, mesh: Mesh, cfg: LlamaConfig) -> Params:
    specs = llama_param_specs(cfg)

    def place(spec, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, specs, params,
                        is_leaf=lambda x: isinstance(x, P))


def sharded_window_nll_fn(mesh: Mesh, cfg: LlamaConfig):
    """jitted (params, tokens[b, s]) -> (sum NLL, count) with batch over
    'data' and tensor-parallel params; used for mesh-parallel perplexity."""
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
