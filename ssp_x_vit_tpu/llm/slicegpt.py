"""SliceGPT baseline: layernorm fusion -> per-layer PCA rotation -> embedding
slicing with residual shortcut matrices.

Reference: src/slicegpt.py:14-60 + the vendored Microsoft engine
(src/slicegpt_utils/rotate.py:124-528 rotate_and_slice_sequential,
layernorm_fusion.py:14-152, modules.py RMSN, slicing_scheduler.py
ConstSlicingScheduler). Algorithm reproduced; mechanics are TPU-native:

- eigendecompositions (pca_calc: damped covariance eigh in float64,
  rotate.py:502-528) run on HOST numpy — TPUs have no native f64 matmul
  (SURVEY.md §7 hard part (c));
- signal capture (layer-0 inputs, attn->mlp signals, layer outputs,
  model_utils.get_signals) runs as jitted partial forwards on device — no
  hooks, one compile per (shape, stage) reused across layers;
- weight rotation/slicing are host-side f64 matmuls on the pytree.

Slicing dims follow ConstSlicingScheduler with do_slice_head=False: every
boundary slices to ``new_dim = (1-s)*d  rounded down to /8`` except the last
layer's MLP output and the head input, which stay at full hidden size
(slicing_scheduler.py:101-115). final_orientation="random" applies a random
orthogonal upper-left block to each Q (src/slicegpt.py:56).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params, _rope
from ssp_x_vit_tpu.ops.attention import sdpa_reference


def _sdpa(q, k, v, window=None):
    """Causal attention through the measured dispatch layer: the flash kernel
    wins at LLM sequence lengths (s >= FLASH_MIN_SEQ, docs/tpu_notes.md), so
    sliced-model perplexity evals at s=2048 should not forgo it. GQA K/V
    (fewer heads than q) pass through un-repeated on the flash path — the
    kernel shares each kv-head's resident K/V across its query group.
    ``window`` = sliding-window attention (mistral); rides the flash kernels
    with out-of-band k-blocks predicated off."""
    from ssp_x_vit_tpu.ops.dispatch import FLASH_MIN_SEQ, use_pallas

    if window is not None and window >= q.shape[2]:
        window = None
    if use_pallas() and q.shape[2] >= FLASH_MIN_SEQ:
        from ssp_x_vit_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=True, window=window)
    if k.shape[1] != q.shape[1]:
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    return sdpa_reference(q, k, v, causal=True, window=window)

RMSN_EPS = 1e-5  # reference modules.py:20 (fixed, regardless of model eps)


# ---------------------------------------------------------------------------
# Sliced model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SlicedLlamaConfig:
    base: LlamaConfig
    new_dim: int
    do_slice_head: bool = False

    @property
    def last_dim(self) -> int:
        return self.new_dim if self.do_slice_head else self.base.hidden_size


def rmsn(x: jax.Array, mean_dim: int) -> jax.Array:
    """RMS normalization WITHOUT scale, divisor fixed to the ORIGINAL hidden
    size even after slicing (reference modules.py:11-29)."""
    x32 = x.astype(jnp.float32)
    variance = jnp.sum(jnp.square(x32), axis=-1, keepdims=True) / mean_dim
    return (x32 * jax.lax.rsqrt(variance + RMSN_EPS)).astype(x.dtype)


def _sliced_attention(h, lp, cfg: LlamaConfig, compute_dtype):
    b, s, _ = h.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = h @ lp["q_kernel"].astype(compute_dtype)
    k = h @ lp["k_kernel"].astype(compute_dtype)
    v = h @ lp["v_kernel"].astype(compute_dtype)
    if "q_bias" in lp:
        q = q + lp["q_bias"].astype(compute_dtype)
        k = k + lp["k_bias"].astype(compute_dtype)
        v = v + lp["v_bias"].astype(compute_dtype)
    q = q.reshape(b, s, nq, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    q, k = _rope(q, k, cfg)
    out = _sdpa(q, k, v, window=cfg.sliding_window)  # GQA-aware dispatch
    out = out.transpose(0, 2, 1, 3).reshape(b, s, nq * hd)
    return out @ lp["o_kernel"].astype(compute_dtype)


def _sliced_mlp(h, lp, compute_dtype):
    g = h @ lp["gate_kernel"].astype(compute_dtype)
    u = h @ lp["up_kernel"].astype(compute_dtype)
    return (jax.nn.silu(g) * u) @ lp["down_kernel"].astype(compute_dtype)


def _sliced_block(x, lp, cfg: LlamaConfig, compute_dtype):
    d_orig = cfg.hidden_size
    attn_out = _sliced_attention(rmsn(x, d_orig), lp, cfg, compute_dtype)
    x = x @ lp["attn_shortcut"].astype(compute_dtype) + attn_out
    mlp_out = _sliced_mlp(rmsn(x, d_orig), lp, compute_dtype)
    x = x @ lp["mlp_shortcut"].astype(compute_dtype) + mlp_out
    return x


def _sliced_attention_phi(h, lp, cfg: LlamaConfig, compute_dtype):
    """phi-2 attention on a sliced input basis: biases + partial rotary
    (reference adapters/phi2_adapter.py CompressedPhiAttention semantics)."""
    b, s, _ = h.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = h @ lp["q_kernel"].astype(compute_dtype) + lp["q_bias"].astype(compute_dtype)
    k = h @ lp["k_kernel"].astype(compute_dtype) + lp["k_bias"].astype(compute_dtype)
    v = h @ lp["v_kernel"].astype(compute_dtype) + lp["v_bias"].astype(compute_dtype)
    q = q.reshape(b, s, nq, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    rd = cfg.rotary_dim
    if cfg.is_opt:
        pass  # learned absolute positions live in the (rotated) embeddings
    elif rd is not None and rd < hd:
        q_rot, k_rot = _rope(q[..., :rd], k[..., :rd], cfg)
        q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
        k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
    else:
        q, k = _rope(q, k, cfg)
    out = _sdpa(q, k, v, window=cfg.sliding_window)  # GQA-aware dispatch
    out = out.transpose(0, 2, 1, 3).reshape(b, s, nq * hd)
    return out @ lp["o_kernel"].astype(compute_dtype) + lp["o_bias"].astype(compute_dtype)


def _sliced_block_phi(x, lp, cfg: LlamaConfig, compute_dtype):
    """phi-2 parallel-residual sliced block: ONE fused RMSN feeds both
    branches, ONE shortcut matrix (reference rotate.py:255-358
    rotate_and_slice_parallel)."""
    from ssp_x_vit_tpu.ops.common import gelu

    h = rmsn(x, cfg.hidden_size)
    attn_out = _sliced_attention_phi(h, lp, cfg, compute_dtype)
    hm = h @ lp["fc1_kernel"].astype(compute_dtype) + lp["fc1_bias"].astype(compute_dtype)
    mlp_out = gelu(hm) @ lp["fc2_kernel"].astype(compute_dtype) + \
        lp["fc2_bias"].astype(compute_dtype)
    return x @ lp["attn_shortcut"].astype(compute_dtype) + attn_out + mlp_out


def _sliced_block_opt(x, lp, cfg: LlamaConfig, compute_dtype):
    """OPT sequential sliced block: biased attention without rope, ReLU fc
    MLP, two shortcut matrices (reference adapters/opt_adapter.py
    CompressedOPTDecoderLayer forward, do_layer_norm_before=True)."""
    d_orig = cfg.hidden_size
    attn_out = _sliced_attention_phi(rmsn(x, d_orig), lp, cfg, compute_dtype)
    x = x @ lp["attn_shortcut"].astype(compute_dtype) + attn_out
    h = rmsn(x, d_orig)
    hm = jax.nn.relu(h @ lp["fc1_kernel"].astype(compute_dtype)
                     + lp["fc1_bias"].astype(compute_dtype))
    mlp_out = hm @ lp["fc2_kernel"].astype(compute_dtype) + \
        lp["fc2_bias"].astype(compute_dtype)
    return x @ lp["mlp_shortcut"].astype(compute_dtype) + mlp_out


def sliced_llama_forward(params: Params, input_ids: jax.Array, scfg: SlicedLlamaConfig,
                         *, compute_dtype=jnp.float32) -> jax.Array:
    cfg = scfg.base
    block = (_sliced_block_phi if cfg.is_phi
             else _sliced_block_opt if cfg.is_opt else _sliced_block)
    x = params["embed"].astype(compute_dtype)[input_ids]
    if cfg.is_opt:
        pos = 2 + jnp.arange(input_ids.shape[1])
        x = x + params["pos_embed"].astype(compute_dtype)[pos][None]
    for lp in params["layers"]:
        x = block(x, lp, cfg, compute_dtype)
    x = rmsn(x, cfg.hidden_size)
    logits = (x @ params["lm_head"].astype(compute_dtype)).astype(jnp.float32)
    if "lm_head_bias" in params:
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    return logits


def evaluate_perplexity_sliced(params, scfg: SlicedLlamaConfig, input_ids,
                               *, seq_len: int = 2048) -> float:
    """Window perplexity for the sliced architecture (same estimator as
    llm.evaluation.evaluate_perplexity)."""

    @jax.jit
    def window_nll(params, tokens):
        logits = sliced_llama_forward(params, tokens, scfg)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
        return jnp.sum(nll), nll.size

    ids = np.asarray(input_ids).reshape(-1)
    n = ids.size // seq_len
    total, count = 0.0, 0
    for i in range(n):
        tokens = jnp.asarray(ids[i * seq_len : (i + 1) * seq_len].reshape(1, -1), jnp.int32)
        s, c = window_nll(params, tokens)
        total += float(s)
        count += int(c)
    return float(np.exp(total / max(1, count)))


# ---------------------------------------------------------------------------
# Rotation engine
# ---------------------------------------------------------------------------

def pca_calc(signals: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Damped covariance eigendecomposition in float64 on host
    (reference rotate.py:502-528). signals: list of [b, s, d]."""
    H = None
    for X in signals:
        X = np.asarray(X, np.float64)
        Hb = np.einsum("bsd,bse->de", X, X)
        H = Hb if H is None else H + Hb
    damp = 0.01 * np.mean(np.diag(H))
    H[np.arange(H.shape[0]), np.arange(H.shape[0])] += damp
    eig_val, eig_vec = np.linalg.eigh(H)
    order = np.argsort(eig_val)[::-1]
    return eig_val[order], eig_vec[:, order]


def random_orthogonal_upper_left(total_dim: int, upper_dim: int, seed: int) -> np.ndarray:
    """Identity with a random orthogonal upper-left block (reference
    rotate.py random_orthogonal_upper_left; used by final_orientation='random')."""
    A = np.random.default_rng(seed).normal(size=(upper_dim, upper_dim))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    out = np.eye(total_dim)
    out[:upper_dim, :upper_dim] = Q
    return out


def fuse_layernorms(params: Params, cfg: LlamaConfig) -> Params:
    """Fold every RMSNorm scale into the following linear's input rows and
    reset norms to scale-free RMSN (reference layernorm_fusion.fuse_modules)."""
    blocks = {k: np.asarray(v, np.float64) for k, v in params["blocks"].items()}
    L = cfg.num_layers
    for i in range(L):
        s1 = blocks["ln1"][i]
        for name in ("q_kernel", "k_kernel", "v_kernel"):
            blocks[name][i] = blocks[name][i] * s1[:, None]
        s2 = blocks["ln2"][i]
        for name in ("gate_kernel", "up_kernel"):
            blocks[name][i] = blocks[name][i] * s2[:, None]
    head = np.asarray(params.get("lm_head", np.asarray(params["embed"]).T), np.float64)
    head = head * np.asarray(params["ln_final"], np.float64)[:, None]
    out = {
        "embed": np.asarray(params["embed"], np.float64),
        "blocks": blocks,
        "lm_head": head,
    }
    return out


def fuse_layernorms_phi(params: Params, cfg: LlamaConfig) -> Params:
    """LayerNorm -> RMSN fusion for phi-2's parallel block (reference
    layernorm_fusion.fuse_modules with parallel_blocks=True and
    should_bake_mean_into_linear=True):

    - embeddings mean-centered per row;
    - ln1 scale folded into q/k/v/fc1 input rows, ln1 bias folded into their
      biases (``b += ln_bias @ K``);
    - mean-subtraction baked into the o/fc2 output linears (column-centered
      kernels, mean-centered biases) so the residual stream stays centered and
      scale-free RMSN equals the original LayerNorm;
    - ln_final fused into the lm head.
    """
    blocks = {k: np.asarray(v, np.float64) for k, v in params["blocks"].items()}
    for i in range(cfg.num_layers):
        s1 = blocks["ln1"][i]
        b1 = blocks["ln1_bias"][i]
        for kn, bn in (("q_kernel", "q_bias"), ("k_kernel", "k_bias"),
                       ("v_kernel", "v_bias"), ("fc1_kernel", "fc1_bias")):
            blocks[bn][i] = blocks[bn][i] + b1 @ blocks[kn][i]
            blocks[kn][i] = blocks[kn][i] * s1[:, None]
        for kn, bn in (("o_kernel", "o_bias"), ("fc2_kernel", "fc2_bias")):
            blocks[kn][i] = blocks[kn][i] - blocks[kn][i].mean(axis=1, keepdims=True)
            blocks[bn][i] = blocks[bn][i] - blocks[bn][i].mean()
    embed = np.asarray(params["embed"], np.float64)
    embed = embed - embed.mean(axis=-1, keepdims=True)
    head = np.asarray(params["lm_head"], np.float64)
    head_bias = np.asarray(params["lm_head_bias"], np.float64) + \
        np.asarray(params["ln_final_bias"], np.float64) @ head
    head = head * np.asarray(params["ln_final"], np.float64)[:, None]
    return {"embed": embed, "blocks": blocks, "lm_head": head,
            "lm_head_bias": head_bias}


def fuse_layernorms_opt(params: Params, cfg: LlamaConfig) -> Params:
    """LayerNorm -> RMSN fusion for OPT's sequential block (reference
    layernorm_fusion.fuse_modules with should_bake_mean_into_linear=True,
    adapters/opt_adapter.py):

    - token AND positional embeddings mean-centered per row;
    - ln1 scale/bias folded into q/k/v; ln2 scale/bias folded into fc1;
    - mean-subtraction baked into the residual writers (o, fc2): column-
      centered kernels + mean-centered biases keep the stream zero-mean so
      scale-free RMSN == the original LayerNorm;
    - ln_final fused into the (tied) lm head, its bias into a logits bias.
    """
    blocks = {k: np.asarray(v, np.float64) for k, v in params["blocks"].items()}
    for i in range(cfg.num_layers):
        s1, b1 = blocks["ln1"][i], blocks["ln1_bias"][i]
        for kn, bn in (("q_kernel", "q_bias"), ("k_kernel", "k_bias"),
                       ("v_kernel", "v_bias")):
            blocks[bn][i] = blocks[bn][i] + b1 @ blocks[kn][i]
            blocks[kn][i] = blocks[kn][i] * s1[:, None]
        s2, b2 = blocks["ln2"][i], blocks["ln2_bias"][i]
        blocks["fc1_bias"][i] = blocks["fc1_bias"][i] + b2 @ blocks["fc1_kernel"][i]
        blocks["fc1_kernel"][i] = blocks["fc1_kernel"][i] * s2[:, None]
        for kn, bn in (("o_kernel", "o_bias"), ("fc2_kernel", "fc2_bias")):
            blocks[kn][i] = blocks[kn][i] - blocks[kn][i].mean(axis=1, keepdims=True)
            blocks[bn][i] = blocks[bn][i] - blocks[bn][i].mean()
    embed = np.asarray(params["embed"], np.float64)
    embed = embed - embed.mean(axis=-1, keepdims=True)
    pos = np.asarray(params["pos_embed"], np.float64)
    pos = pos - pos.mean(axis=-1, keepdims=True)
    head = np.asarray(params["lm_head"] if "lm_head" in params
                      else np.asarray(params["embed"], np.float64).T, np.float64)
    head_bias = np.asarray(params["ln_final_bias"], np.float64) @ head
    head = head * np.asarray(params["ln_final"], np.float64)[:, None]
    return {"embed": embed, "pos_embed": pos, "blocks": blocks,
            "lm_head": head, "lm_head_bias": head_bias}


def slicegpt_opt(
    params: Params,
    cfg: LlamaConfig,
    sparsity: float,
    calibration: Sequence[np.ndarray],
    *,
    final_orientation: str = "random",
    seed: int = 0,
    compute_dtype=jnp.float32,
) -> Tuple[Params, SlicedLlamaConfig]:
    """SliceGPT for OPT: the sequential two-Q-per-layer flow of ``slicegpt``
    with LayerNorm fusion, biased projections and rotated positional
    embeddings (reference rotate.py rotate_and_slice_sequential +
    adapters/opt_adapter.py)."""
    d = cfg.hidden_size
    new_dim = int((1 - sparsity) * d)
    new_dim -= new_dim % 8
    print(f"New embedding dimension: {new_dim} "
          f"(sparsity {100*(1 - new_dim / d):.4f} %)")

    fused = fuse_layernorms_opt(params, cfg)
    L = cfg.num_layers
    blocks = fused["blocks"]

    @jax.jit
    def embed_fn(embed, pos_embed, tokens):
        x = embed.astype(compute_dtype)[tokens]
        return x + pos_embed.astype(compute_dtype)[2 + jnp.arange(tokens.shape[1])][None]

    @jax.jit
    def _attn_to_mlp(lp, x):
        attn_out = _sliced_attention_phi(rmsn(x, d), lp, cfg, compute_dtype)
        return x @ lp["attn_shortcut"].astype(compute_dtype) + attn_out

    @jax.jit
    def _layer_out(lp, x):
        return _sliced_block_opt(x, lp, cfg, compute_dtype)

    tokens_list = [jnp.asarray(np.asarray(c).reshape(1, -1), jnp.int32)
                   for c in calibration]
    embed_dev = jnp.asarray(fused["embed"], compute_dtype)
    pos_dev = jnp.asarray(fused["pos_embed"], compute_dtype)
    inps = [np.asarray(embed_fn(embed_dev, pos_dev, t)) for t in tokens_list]

    _, Q = pca_calc(inps)
    if final_orientation == "random":
        Q = Q @ random_orthogonal_upper_left(d, new_dim, seed)
    embed = (fused["embed"] @ Q)[:, :new_dim]
    pos_embed = (fused["pos_embed"] @ Q)[:, :new_dim]

    sliced_layers: List[Dict[str, Any]] = []
    for idx in range(L):
        lp: Dict[str, Any] = {}
        for name in ("q_kernel", "k_kernel", "v_kernel"):
            lp[name] = (Q.T @ blocks[name][idx])[:new_dim, :]
        for name in ("q_bias", "k_bias", "v_bias", "fc1_bias"):
            lp[name] = blocks[name][idx]
        lp["attn_shortcut"] = Q.T[:new_dim, :].copy()
        lp["o_kernel"] = blocks["o_kernel"][idx]
        lp["o_bias"] = blocks["o_bias"][idx]
        lp["fc1_kernel"] = blocks["fc1_kernel"][idx]
        lp["fc2_kernel"] = blocks["fc2_kernel"][idx]
        lp["fc2_bias"] = blocks["fc2_bias"][idx]
        lp["mlp_shortcut"] = np.eye(d)  # placeholder until Q2

        inps = [np.asarray(x @ Q, np.float64)[:, :, :new_dim] for x in inps]

        lp_dev = {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()}
        inps_dev = [jnp.asarray(x, compute_dtype) for x in inps]
        mlp_ln_inputs = [np.asarray(_attn_to_mlp(lp_dev, x)) for x in inps_dev]

        _, Q2 = pca_calc(mlp_ln_inputs)
        if final_orientation == "random":
            Q2 = Q2 @ random_orthogonal_upper_left(Q2.shape[0], new_dim,
                                                   seed + idx + 1)
        lp["attn_shortcut"] = lp["attn_shortcut"] @ Q2[:, :new_dim]
        lp["o_kernel"] = (lp["o_kernel"] @ Q2)[:, :new_dim]
        lp["o_bias"] = (lp["o_bias"] @ Q2)[:new_dim]
        lp["mlp_shortcut"] = Q2.T[:new_dim, :].copy()
        lp["fc1_kernel"] = (Q2.T @ lp["fc1_kernel"])[:new_dim, :]

        lp_dev = {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()}
        outs = [np.asarray(_layer_out(lp_dev, x)) for x in inps_dev]

        _, Q3 = pca_calc(outs)
        last = idx == L - 1
        out_dim = d if last else new_dim  # do_slice_head=False keeps the last full
        if final_orientation == "random":
            Q3 = Q3 @ random_orthogonal_upper_left(Q3.shape[0], out_dim,
                                                   seed + 10_000 + idx)
        lp["mlp_shortcut"] = (lp["mlp_shortcut"] @ Q3)[:, :out_dim]
        lp["fc2_kernel"] = (lp["fc2_kernel"] @ Q3)[:, :out_dim]
        lp["fc2_bias"] = (lp["fc2_bias"] @ Q3)[:out_dim]
        sliced_layers.append(lp)

        inps = [np.asarray(o, np.float64) for o in outs]
        Q = Q3

    head = Q.T @ fused["lm_head"]
    scfg = SlicedLlamaConfig(base=cfg, new_dim=new_dim, do_slice_head=False)
    sliced_params: Params = {
        "embed": jnp.asarray(embed, compute_dtype),
        "pos_embed": jnp.asarray(pos_embed, compute_dtype),
        "layers": [
            {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()}
            for lp in sliced_layers
        ],
        "lm_head": jnp.asarray(head, compute_dtype),
        "lm_head_bias": jnp.asarray(fused["lm_head_bias"], compute_dtype),
    }
    return sliced_params, scfg


def slicegpt_parallel(
    params: Params,
    cfg: LlamaConfig,
    sparsity: float,
    calibration: Sequence[np.ndarray],
    *,
    final_orientation: str = "random",
    seed: int = 0,
    compute_dtype=jnp.float32,
) -> Tuple[Params, SlicedLlamaConfig]:
    """SliceGPT for parallel-residual models (phi-2): ONE PCA rotation per
    layer boundary — the fused RMSN feeds both branches, so there is no
    attn/mlp Q2 split (reference rotate.py:255-358 rotate_and_slice_parallel,
    adapters/phi2_adapter.py)."""
    d = cfg.hidden_size
    new_dim = int((1 - sparsity) * d)
    new_dim -= new_dim % 8
    print(f"New embedding dimension: {new_dim} "
          f"(sparsity {100*(1 - new_dim / d):.4f} %)")

    fused = fuse_layernorms_phi(params, cfg)
    L = cfg.num_layers
    blocks = fused["blocks"]

    @jax.jit
    def embed_fn(embed, tokens):
        return embed.astype(compute_dtype)[tokens]

    @jax.jit
    def _layer_out(lp, x):
        return _sliced_block_phi(x, lp, cfg, compute_dtype)

    tokens_list = [jnp.asarray(np.asarray(c).reshape(1, -1), jnp.int32)
                   for c in calibration]
    embed_dev = jnp.asarray(fused["embed"], compute_dtype)
    inps = [np.asarray(embed_fn(embed_dev, t)) for t in tokens_list]

    _, Q = pca_calc(inps)
    if final_orientation == "random":
        Q = Q @ random_orthogonal_upper_left(d, new_dim, seed)
    embed = (fused["embed"] @ Q)[:, :new_dim]

    sliced_layers: List[Dict[str, Any]] = []
    for idx in range(L):
        lp: Dict[str, Any] = {}
        # rotate+slice BOTH branches' inputs by the same Q
        for name in ("q_kernel", "k_kernel", "v_kernel", "fc1_kernel"):
            lp[name] = (Q.T @ blocks[name][idx])[:new_dim, :]
        for name in ("q_bias", "k_bias", "v_bias", "fc1_bias",
                     "o_bias", "fc2_bias"):
            lp[name] = blocks[name][idx]
        lp["o_kernel"] = blocks["o_kernel"][idx]
        lp["fc2_kernel"] = blocks["fc2_kernel"][idx]
        lp["attn_shortcut"] = Q.T[:new_dim, :].copy()

        inps = [np.asarray(x @ Q, np.float64)[:, :, :new_dim] for x in inps]

        lp_dev = {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()}
        inps_dev = [jnp.asarray(x, compute_dtype) for x in inps]
        outs = [np.asarray(_layer_out(lp_dev, x)) for x in inps_dev]

        _, Qn = pca_calc(outs)
        last = idx == L - 1
        out_dim = d if last else new_dim  # do_slice_head=False keeps the last full
        if final_orientation == "random":
            Qn = Qn @ random_orthogonal_upper_left(Qn.shape[0], out_dim,
                                                   seed + idx + 1)

        lp["attn_shortcut"] = (lp["attn_shortcut"] @ Qn)[:, :out_dim]
        lp["o_kernel"] = (lp["o_kernel"] @ Qn)[:, :out_dim]
        lp["o_bias"] = (lp["o_bias"] @ Qn)[:out_dim]
        lp["fc2_kernel"] = (lp["fc2_kernel"] @ Qn)[:, :out_dim]
        lp["fc2_bias"] = (lp["fc2_bias"] @ Qn)[:out_dim]
        sliced_layers.append(lp)

        inps = [np.asarray(o, np.float64) for o in outs]
        Q = Qn

    head = Q.T @ fused["lm_head"]
    scfg = SlicedLlamaConfig(base=cfg, new_dim=new_dim, do_slice_head=False)
    sliced_params: Params = {
        "embed": jnp.asarray(embed, compute_dtype),
        "layers": [
            {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()}
            for lp in sliced_layers
        ],
        "lm_head": jnp.asarray(head, compute_dtype),
        "lm_head_bias": jnp.asarray(fused["lm_head_bias"], compute_dtype),
    }
    return sliced_params, scfg


def slicegpt(
    params: Params,
    cfg: LlamaConfig,
    sparsity: float,
    calibration: Sequence[np.ndarray],
    *,
    final_orientation: str = "random",
    seed: int = 0,
    compute_dtype=jnp.float32,
) -> Tuple[Params, SlicedLlamaConfig]:
    """Run the full SliceGPT pipeline; returns (sliced_params, sliced_cfg).

    ``calibration``: list of [1, seq] token windows. phi-2's parallel block
    dispatches to the single-Q parallel engine.
    """
    if cfg.hidden_act != "silu" or cfg.scale_embeddings:
        raise ValueError(
            "slicegpt covers the silu llama-layout archs (+phi-2/OPT "
            "engines); gemma's sqrt(d)-scaled embeddings share weights with "
            "an UNSCALED tied head, so the embedding-side rotation fold "
            "does not commute — use 2SSP/depth pruning for gemma")
    if cfg.qk_norm:
        raise ValueError(
            "slicegpt cannot rotate qwen3: the per-head q/k RMSNorm sits "
            "between the projections and rope, and a hidden-dim rotation "
            "does not commute through the per-head normalization — use "
            "2SSP/depth pruning for qwen3")
    if cfg.is_phi:
        return slicegpt_parallel(params, cfg, sparsity, calibration,
                                 final_orientation=final_orientation,
                                 seed=seed, compute_dtype=compute_dtype)
    if cfg.is_opt:
        return slicegpt_opt(params, cfg, sparsity, calibration,
                            final_orientation=final_orientation,
                            seed=seed, compute_dtype=compute_dtype)
    d = cfg.hidden_size
    new_dim = int((1 - sparsity) * d)
    new_dim -= new_dim % 8  # reference src/slicegpt.py:47-49
    print(f"New embedding dimension: {new_dim} "
          f"(sparsity {100*(1 - new_dim / d):.4f} %)")

    fused = fuse_layernorms(params, cfg)
    L = cfg.num_layers

    # ---- jitted signal-capture helpers (device); defined ONCE so the jit
    # cache is shared across layers (const dims -> 1-2 compiles per stage) ----
    @jax.jit
    def embed_fn(embed, tokens):
        return embed.astype(compute_dtype)[tokens]

    @jax.jit
    def _attn_to_mlp(lp, x):
        """x (rotated+sliced) -> input of the MLP RMSN (x after attn residual)."""
        attn_out = _sliced_attention(rmsn(x, d), lp, cfg, compute_dtype)
        return x @ lp["attn_shortcut"].astype(compute_dtype) + attn_out

    @jax.jit
    def _layer_out(lp, x):
        return _sliced_block(x, lp, cfg, compute_dtype)

    def capture_attn_to_mlp(lp_dev, inps_dev):
        return [np.asarray(_attn_to_mlp(lp_dev, x)) for x in inps_dev]

    def capture_layer_out(lp_dev, inps_dev):
        return [np.asarray(_layer_out(lp_dev, x)) for x in inps_dev]

    tokens_list = [jnp.asarray(np.asarray(c).reshape(1, -1), jnp.int32) for c in calibration]

    # layer-0 inputs = embeddings (llama has no pre-layer processing)
    embed_dev = jnp.asarray(fused["embed"], compute_dtype)
    inps = [np.asarray(embed_fn(embed_dev, t)) for t in tokens_list]

    _, Q = pca_calc(inps)
    if final_orientation == "random":
        Q = Q @ random_orthogonal_upper_left(d, new_dim, seed)

    # rotate + slice embeddings
    embed = (fused["embed"] @ Q)[:, :new_dim]

    sliced_layers: List[Dict[str, Any]] = []
    blocks = fused["blocks"]

    for idx in range(L):
        lp: Dict[str, Any] = {}
        attn_shortcut = Q.T.copy()  # [d, d]

        # rotate+slice attention inputs (kernel [in, out]: K' = Q.T @ K)
        for name in ("q_kernel", "k_kernel", "v_kernel"):
            lp[name] = (Q.T @ blocks[name][idx])[:new_dim, :]
        for name in ("q_bias", "k_bias", "v_bias"):
            if name in blocks:
                lp[name] = blocks[name][idx]
        attn_shortcut = attn_shortcut[:new_dim, :]
        lp["o_kernel"] = blocks["o_kernel"][idx]
        lp["attn_shortcut"] = attn_shortcut
        lp["gate_kernel"] = blocks["gate_kernel"][idx]
        lp["up_kernel"] = blocks["up_kernel"][idx]
        lp["down_kernel"] = blocks["down_kernel"][idx]
        lp["mlp_shortcut"] = np.eye(d)  # placeholder until Q2

        # rotate inputs into the current basis
        inps = [np.asarray(x @ Q, np.float64)[:, :, :new_dim] for x in inps]

        lp_dev = {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()}
        inps_dev = [jnp.asarray(x, compute_dtype) for x in inps]
        mlp_ln_inputs = capture_attn_to_mlp(lp_dev, inps_dev)

        _, Q2 = pca_calc(mlp_ln_inputs)
        attn_out_dim = new_dim
        if final_orientation == "random":
            Q2 = Q2 @ random_orthogonal_upper_left(Q2.shape[0], attn_out_dim, seed + idx + 1)

        lp["attn_shortcut"] = attn_shortcut @ Q2[:, :attn_out_dim]
        lp["o_kernel"] = (lp["o_kernel"] @ Q2)[:, :attn_out_dim]
        lp["mlp_shortcut"] = Q2.T[:attn_out_dim, :].copy()
        lp["gate_kernel"] = (Q2.T @ lp["gate_kernel"])[:attn_out_dim, :]
        lp["up_kernel"] = (Q2.T @ lp["up_kernel"])[:attn_out_dim, :]

        # layer outputs -> next-layer inputs, in the Q2 basis
        lp_dev = {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()}
        outs = capture_layer_out(lp_dev, inps_dev)

        _, Q3 = pca_calc(outs)
        last = idx == L - 1
        out_dim = d if last else new_dim  # do_slice_head=False keeps the last full
        if final_orientation == "random":
            Q3 = Q3 @ random_orthogonal_upper_left(Q3.shape[0], out_dim, seed + 10_000 + idx)

        lp["mlp_shortcut"] = (lp["mlp_shortcut"] @ Q3)[:, :out_dim]
        lp["down_kernel"] = (lp["down_kernel"] @ Q3)[:, :out_dim]
        sliced_layers.append(lp)

        # Next layer's inputs are THIS layer's outputs in the pre-Q3 basis
        # (reference keeps `inps` from get_signals and carries Q=Q3 into the
        # next iteration's rotate+slice). ``outs`` were captured pre-Q3, so
        # just carry them plus the basis. The top-of-loop then computes
        # (outs @ Q3)[:, :new_dim] and rotates the next kernels with Q3.
        inps = [np.asarray(o, np.float64) for o in outs]
        Q = Q3

    # head: rotate by the final Q (torch W@Q, W [V, d] -> kernel Q.T @ K);
    # not sliced with do_slice_head=False (reference slicing_scheduler:115).
    head = Q.T @ fused["lm_head"]

    scfg = SlicedLlamaConfig(base=cfg, new_dim=new_dim, do_slice_head=False)
    sliced_params: Params = {
        "embed": jnp.asarray(embed, compute_dtype),
        "layers": [
            {k: jnp.asarray(v, compute_dtype) for k, v in lp.items()} for lp in sliced_layers
        ],
        "lm_head": jnp.asarray(head, compute_dtype),
    }
    return sliced_params, scfg
