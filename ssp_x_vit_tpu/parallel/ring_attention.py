"""Ring attention: sequence/context parallelism over the ICI.

Long-context counterpart of the flash kernel (ops/pallas/flash_attention.py):
the sequence axis is sharded over a ``seq`` mesh axis, each device holds one
Q chunk, and K/V chunks rotate around the ring with ``lax.ppermute`` while a
flash-style online softmax accumulates — full attention numerics with s/N
activation memory per chip and ICI transfers overlapped with chunk compute.

The reference has no long-context machinery at all (single-GPU, s=2048
windows, src/evaluation.py:24-64); this is the §5.7 long-context subsystem
of the rebuild. ``make_seq_parallel_nll`` applies it to the llama stack:
token windows are split over 'seq', every block's attention runs on the
ring, and the NLL reduction psums over ('data','seq') — the streaming
perplexity estimator at context lengths no single chip could hold.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params, _layer_norm, rms_norm

_NEG = -1e30


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
                   *, n_chunks: int, causal: bool = True, window=None,
                   softcap=None, scale=None) -> jax.Array:
    """Exact attention over a sequence-sharded ring.

    q/k: LOCAL chunks [b, h, s_local, hd]; v may carry a DIFFERENT head dim
    [b, h, s_local, vd] (MLA: qk_head_dim != v_head_dim); the global
    sequence is the concatenation of chunks in mesh-axis order. Returns the
    local output chunk [b, h, s_local, vd]. Causal masking uses GLOBAL
    positions: the K/V block held after r rotations originated on device
    (p - r) mod N.

    ``window`` adds a sliding-window band over the SAME global positions
    (HF convention, qpos - kpos < window; requires causal). It may be a
    static int or a traced scalar — gemma-2 mixed configs scan per-layer
    bounds through the block loop. ``softcap`` applies gemma-2 logit
    soft-capping cap*tanh(z/cap) before the mask. ``scale`` overrides the
    default 1/sqrt(hd) softmax scale (MLA's yarn-mscaled scale,
    llm/deepseek.mla_softmax_scale).
    """
    p = lax.axis_index(axis_name)
    b, hq, sl, hd = q.shape
    vd = v.shape[-1]
    hkv = k.shape[1]
    rep = hq // hkv
    # GQA: k/v travel the ring UN-repeated ([b, hkv, sl, hd]) — repeating
    # before the ring would multiply ICI transfer and residency by the group
    # factor; the query groups share each kv head via the grouped einsum.
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    q32 = (q.astype(jnp.float32) * scale).reshape(b, hkv, rep, sl, hd)
    iq = jnp.arange(sl)
    perm = [(i, (i + 1) % n_chunks) for i in range(n_chunks)]

    m = jnp.full((b, hkv, rep, sl), _NEG, jnp.float32)
    l = jnp.zeros((b, hkv, rep, sl), jnp.float32)
    acc = jnp.zeros((b, hkv, rep, sl, vd), jnp.float32)

    def step(carry, r):
        m, l, acc, k, v = carry
        src = jnp.mod(p - r, n_chunks)  # origin chunk of the K/V we hold now
        s_ = jnp.einsum("bkrqd,bksd->bkrqs", q32, k.astype(jnp.float32))
        if softcap is not None:
            s_ = softcap * jnp.tanh(s_ / softcap)
        if causal:
            qpos = p * sl + iq[:, None]
            kpos = src * sl + iq[None, :]
            keep = qpos >= kpos
            if window is not None:
                keep = jnp.logical_and(keep, qpos - kpos < window)
            s_ = jnp.where(keep[None, None, None], s_, _NEG)
        m_new = jnp.maximum(m, jnp.max(s_, axis=-1))
        alpha = jnp.exp(m - m_new)
        pexp = jnp.exp(s_ - m_new[..., None])
        l = l * alpha + jnp.sum(pexp, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bkrqs,bksd->bkrqd", pexp, v.astype(jnp.float32))
        k = lax.ppermute(k, axis_name, perm)
        v = lax.ppermute(v, axis_name, perm)
        return (m_new, l, acc, k, v), None

    (m, l, acc, _, _), _ = lax.scan(step, (m, l, acc, k, v), jnp.arange(n_chunks))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(b, hq, sl, vd).astype(q.dtype)


def _rope_at(q, k, cfg, positions):
    """HF half-rotation rope at explicit GLOBAL positions [s_local].
    ``cfg.rotary_dim`` rotates only the first dims (phi-2 partial rotary);
    ``cfg.rope_scaling`` frequencies shared via llm/rope.py."""
    from ssp_x_vit_tpu.llm.rope import rope_freqs

    hd = q.shape[-1]
    rotary_dim = cfg.rotary_dim
    rd = rotary_dim if (rotary_dim is not None and rotary_dim < hd) else hd
    inv_freq_np, attn_scale = rope_freqs(cfg.rope_theta, rd, cfg.rope_scaling)
    freqs = jnp.outer(positions.astype(jnp.float32), jnp.asarray(inv_freq_np))
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos = (jnp.cos(emb) * attn_scale)[None, None]
    sin = (jnp.sin(emb) * attn_scale)[None, None]

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    def apply(x):
        xr = x[..., :rd].astype(jnp.float32)
        out = (xr * cos + rot(xr) * sin).astype(x.dtype)
        return out if rd == hd else jnp.concatenate([out, x[..., rd:]], axis=-1)

    return apply(q), apply(k)


def make_seq_parallel_nll(mesh: Mesh, cfg: LlamaConfig, compute_dtype=jnp.float32):
    """Build ``(params, tokens[b, s]) -> per-window NLL sums [b]`` with the
    sequence axis sharded over mesh axis 'seq' and batch over 'data'.

    Params are replicated (context parallelism: activations are what's big);
    every attention runs on the ring; the (s-1)-token next-token NLL matches
    llm/evaluation.py's estimator exactly.

    Covers the llama block layout (llama/mistral/qwen2/gemma/gemma-2) and
    phi-2's parallel-residual block. Gemma rides sqrt(d)-scaled embeddings
    and the tanh-gelu GLU; gemma-2 adds post-norms on the residual deltas,
    attention/final logit soft-capping (the attn cap rides the ring's
    online softmax as a pre-mask epilogue), and MIXED per-layer sliding
    windows — per-layer band bounds scan through the block loop and mask on
    global ring positions, so the full-attention layers see the whole
    sharded context while windowed layers stay banded. OPT is refused
    (2048 learned-position cap — no long-context case).
    """
    sp = mesh.shape["seq"]
    if cfg.is_opt:
        raise ValueError("seq-parallel path covers llama-layout (incl. "
                         "gemma/gemma-2) and phi configs (OPT's learned-"
                         "position table is bounded at 2048 — no "
                         "long-context use case)")
    # Sliding windows ride the ring as a band mask over the SAME global
    # positions — exact vs the single-device forward. For UNIFORM-window
    # models the ring buys little (SWA is local; dp x tp is the better
    # layout), but gemma-2/qwen2 MIXED configs interleave full-attention
    # layers that DO need the whole context — those evaluate here.
    mixed = cfg.sliding_window is not None and not cfg.uniform_window
    from ssp_x_vit_tpu.llm.model import _embed_tokens, _glu_act, _head_logits

    glu_act = None if (cfg.is_phi or cfg.is_opt) else _glu_act(cfg)

    def inner(params, tokens):
        """tokens: [b_local, s] (full windows, replicated over 'seq')."""
        pidx = lax.axis_index("seq")
        b, s = tokens.shape
        sl = s // sp
        start = pidx * sl
        tok_local = lax.dynamic_slice_in_dim(tokens, start, sl, axis=1)
        positions = start + jnp.arange(sl)
        x = _embed_tokens(params, tok_local, cfg, compute_dtype)

        def attend(h, bp, window):
            """qkv projections (+biases) -> rope at GLOBAL positions -> ring ->
            o-projection (+bias). k/v stay at nkv heads — ring_attention
            handles GQA internally."""
            nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            q = h @ bp["q_kernel"].astype(compute_dtype)
            k = h @ bp["k_kernel"].astype(compute_dtype)
            v = h @ bp["v_kernel"].astype(compute_dtype)
            if "q_bias" in bp:
                q = q + bp["q_bias"].astype(compute_dtype)
                k = k + bp["k_bias"].astype(compute_dtype)
                v = v + bp["v_bias"].astype(compute_dtype)
            q = q.reshape(b, sl, nq, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, sl, nkv, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, sl, nkv, hd).transpose(0, 2, 1, 3)
            if cfg.qk_norm:  # qwen3 per-head RMSNorm before rope
                q = rms_norm(q, bp["q_norm"], cfg.rms_eps)
                k = rms_norm(k, bp["k_norm"], cfg.rms_eps)
            q, k = _rope_at(q, k, cfg, positions)
            out = ring_attention(q, k, v, "seq", n_chunks=sp, causal=True,
                                 window=window, softcap=cfg.attn_softcap)
            out = out.transpose(0, 2, 1, 3).reshape(b, sl, nq * hd)
            out = out @ bp["o_kernel"].astype(compute_dtype)
            if "o_bias" in bp:
                out = out + bp["o_bias"].astype(compute_dtype)
            return out

        def body(x, scanned):
            bp, wb = scanned
            # mixed configs: traced per-layer band bound rides the scan
            # (full-attention layers carry the vacuous _FULL_BOUND); uniform
            # configs keep a static (possibly absent) window.
            window = wb if mixed else cfg.sliding_window
            if cfg.is_phi:
                # phi-2 parallel residual: one LayerNorm feeds both branches,
                # x' = x + attn(h) + mlp(h) (cf. llm/model.py llama_forward).
                from ssp_x_vit_tpu.ops.common import gelu

                h = _layer_norm(x, bp["ln1"], bp["ln1_bias"], cfg.layer_norm_eps)
                attn = attend(h, bp, window)
                hm = h @ bp["fc1_kernel"].astype(compute_dtype) + \
                    bp["fc1_bias"].astype(compute_dtype)
                mlp = gelu(hm) @ bp["fc2_kernel"].astype(compute_dtype) + \
                    bp["fc2_bias"].astype(compute_dtype)
                return x + attn + mlp, None
            attn = attend(rms_norm(x, bp["ln1"], cfg.rms_eps), bp, window)
            if cfg.is_gemma2:
                # gemma-2 post-norms on the residual deltas (llm/model.py)
                attn = rms_norm(attn, bp["ln1_post"], cfg.rms_eps)
            x = x + attn
            h2 = rms_norm(x, bp["ln2"], cfg.rms_eps)
            g = h2 @ bp["gate_kernel"].astype(compute_dtype)
            u = h2 @ bp["up_kernel"].astype(compute_dtype)
            mlp = (glu_act(g) * u) @ bp["down_kernel"].astype(compute_dtype)
            if cfg.is_gemma2:
                mlp = rms_norm(mlp, bp["ln2_post"], cfg.rms_eps)
            return x + mlp, None

        wbounds = (jnp.asarray(cfg.layer_window_bounds, jnp.int32) if mixed
                   else jnp.zeros((cfg.num_layers,), jnp.int32))
        x, _ = lax.scan(body, x, (params["blocks"], wbounds))
        if cfg.is_phi:
            x = _layer_norm(x, params["ln_final"], params["ln_final_bias"],
                            cfg.layer_norm_eps)
        else:
            x = rms_norm(x, params["ln_final"], cfg.rms_eps)
        logits = _head_logits(params, x, compute_dtype, cfg.final_softcap)

        # local targets: global positions start+1 .. start+sl (the final
        # global position has no target — mask it out)
        tok_pad = jnp.pad(tokens, ((0, 0), (0, 1)))
        targets = lax.dynamic_slice_in_dim(tok_pad, start + 1, sl, axis=1)
        valid = (positions < s - 1).astype(jnp.float32)[None, :]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, :, None], axis=-1)[..., 0]
        per_window = jnp.sum(nll * valid, axis=1)          # [b_local]
        return lax.psum(per_window, "seq")

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


def evaluate_perplexity_seq_parallel(params: Params, cfg: LlamaConfig, mesh: Mesh,
                                     input_ids, *, seq_len: int = 2048) -> float:
    """Sequence-parallel streaming perplexity (reference estimator,
    src/evaluation.py:24-64) — windows over 'data', context over 'seq'.
    DeepseekConfig dispatches to the MLA latent ring
    (parallel/deepseek_parallel.py)."""
    ids = np.asarray(input_ids).reshape(-1)
    dp = mesh.shape["data"]
    num_windows = ids.size // seq_len
    if num_windows == 0:
        raise ValueError(
            f"input has {ids.size} tokens < seq_len {seq_len}: no full "
            "window to evaluate (a silent ppl=1.0 would corrupt comparisons)")
    windows = ids[: num_windows * seq_len].reshape(num_windows, seq_len)
    pad = (-num_windows) % dp
    if pad:
        windows = np.concatenate([windows, np.tile(windows[-1:], (pad, 1))])
    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig

    if isinstance(cfg, DeepseekConfig):
        from ssp_x_vit_tpu.parallel.deepseek_parallel import \
            make_deepseek_seq_parallel_nll

        run = jax.jit(make_deepseek_seq_parallel_nll(mesh, cfg))
    else:
        run = jax.jit(make_seq_parallel_nll(mesh, cfg))

    total, count = 0.0, 0
    for i in range(0, len(windows), dp):
        valid = min(dp, num_windows - i)
        batch = jnp.asarray(windows[i : i + dp], jnp.int32)
        per_window = np.asarray(run(params, batch))        # [dp]
        total += float(per_window[:valid].sum())
        count += valid * (seq_len - 1)
    return float(np.exp(total / max(1, count)))
