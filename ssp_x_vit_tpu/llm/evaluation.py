"""Perplexity and timing evaluation for the LLM path
(reference src/evaluation.py:9-64, 119-146).

``evaluate_perplexity``: fixed ``seq_len``-token windows, running-mean NLL
(the EvoPress-style streaming estimate the reference uses), masked/materialized
model support. The per-window forward is jitted ONCE per (shape, cfg); the
stage-2 candidate loop only changes gate VALUES, so the whole greedy search
runs without a single retrace (reference re-evaluates with monkey-patched
modules, src/utilities.py:447-505).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, llama_forward, llama_forward_materialized


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, tokens, attn_gate, mlp_gate, neuron_mask, cfg: LlamaConfig):
    """tokens [b, seq] -> (sum NLL over shifted positions, count)."""
    logits, _ = llama_forward(params, tokens, cfg, attn_gate=attn_gate,
                              mlp_gate=mlp_gate, neuron_mask=neuron_mask)
    shift_logits = logits[:, :-1]
    shift_labels = tokens[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll_deepseek(params, tokens, attn_gate, mlp_gate, cfg):
    """DeepSeek/MLA window NLL (same shifted-NLL contract as _window_nll);
    gates drive the depth-pruning searches exactly like the llama family."""
    from ssp_x_vit_tpu.llm.deepseek import deepseek_forward

    logits = deepseek_forward(params, tokens, cfg, compute_dtype=jnp.float32,
                              attn_gate=attn_gate, mlp_gate=mlp_gate)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll_deepseek_materialized(params, tokens, cfg):
    from ssp_x_vit_tpu.llm.deepseek import deepseek_forward_materialized

    logits = deepseek_forward_materialized(params, tokens, cfg,
                                           compute_dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll_candidates_deepseek(params, tokens, attn_gates, mlp_gates, cfg):
    """Vmapped gate-candidate scoring for the MLA family — one dispatch per
    chunk of skip patterns (2SSP stage-2 / blockpruner inner loop)."""
    from ssp_x_vit_tpu.llm.deepseek import deepseek_forward

    def one(ga, gm):
        logits = deepseek_forward(params, tokens, cfg,
                                  compute_dtype=jnp.float32,
                                  attn_gate=ga, mlp_gate=gm)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
        return jnp.sum(nll)

    return jax.vmap(one)(attn_gates, mlp_gates)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll_candidates(params, tokens, attn_gates, mlp_gates, neuron_mask, cfg: LlamaConfig):
    """Vmapped candidate evaluation: attn_gates/mlp_gates [C, L] -> per-candidate
    summed NLL [C]. One dispatch scores a whole batch of skip patterns — the
    inner loop of the stage-2 greedy search and blockpruner."""

    def one(ga, gm):
        logits, _ = llama_forward(params, tokens, cfg, attn_gate=ga, mlp_gate=gm,
                                  neuron_mask=neuron_mask)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
        return jnp.sum(nll)

    return jax.vmap(one)(attn_gates, mlp_gates)


def evaluate_perplexity_candidates(
    params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    attn_gates: np.ndarray,
    mlp_gates: Optional[np.ndarray] = None,
    *,
    seq_len: int = 2048,
    chunk: int = 8,
) -> np.ndarray:
    """Perplexity of C gate candidates over the calibration stream -> [C].

    Candidates are evaluated ``chunk`` at a time inside one jitted vmap
    (memory-bounded); all windows stream through each chunk.
    """
    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig

    ids = np.asarray(input_ids).reshape(-1)
    num_samples = ids.size // seq_len
    C, L = np.asarray(attn_gates).shape
    ga = jnp.asarray(attn_gates, jnp.float32)
    gm = jnp.asarray(mlp_gates if mlp_gates is not None else np.ones((C, L)), jnp.float32)
    nm = jnp.ones((L, 1), jnp.float32)
    is_mla = isinstance(cfg, DeepseekConfig)

    totals = np.zeros((C,), np.float64)
    tokens_per_window = seq_len - 1
    for i in range(num_samples):
        tokens = jnp.asarray(ids[i * seq_len : (i + 1) * seq_len].reshape(1, -1), jnp.int32)
        for c0 in range(0, C, chunk):
            sl = slice(c0, min(C, c0 + chunk))
            if is_mla:
                sums = _window_nll_candidates_deepseek(params, tokens,
                                                       ga[sl], gm[sl], cfg)
            else:
                sums = _window_nll_candidates(params, tokens, ga[sl], gm[sl], nm, cfg)
            totals[sl] += np.asarray(sums, np.float64)
    return np.exp(totals / max(1, num_samples * tokens_per_window))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll_materialized(params, tokens, cfg: LlamaConfig):
    logits = llama_forward_materialized(params, tokens, cfg)
    shift_logits = logits[:, :-1]
    shift_labels = tokens[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


def evaluate_perplexity(
    params,
    cfg: LlamaConfig,
    input_ids: np.ndarray,
    *,
    seq_len: int = 2048,
    batch_size: int = 1,
    attn_gate=None,
    mlp_gate=None,
    neuron_mask=None,
    enable_tqdm: bool = True,
) -> float:
    """Perplexity over ``input_ids`` ([1, N] or [N]) in ``seq_len`` windows.

    Reference numerics: running weighted mean of per-window mean NLL
    (src/evaluation.py:43-63) == global token-mean NLL, computed here as a
    direct sum/count (identical value, fewer host syncs).
    """
    ids = np.asarray(input_ids).reshape(-1)
    num_samples = ids.size // seq_len
    if num_samples == 0:
        raise ValueError(f"need at least {seq_len} tokens, got {ids.size}")

    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig

    if isinstance(cfg, DeepseekConfig):
        if neuron_mask is not None:
            raise ValueError("neuron masks don't apply to the MLA family "
                             "(stage-1 width materializes directly)")
        L = cfg.num_layers
        ga = (jnp.asarray(attn_gate, jnp.float32) if attn_gate is not None
              else jnp.ones((L,), jnp.float32))
        gm = (jnp.asarray(mlp_gate, jnp.float32) if mlp_gate is not None
              else jnp.ones((L,), jnp.float32))
        mla_materialized = bool(cfg.pruned_attention_blocks)
        total_nll, total_tokens = 0.0, 0
        for i in range(0, num_samples, batch_size):
            j = min(i + batch_size, num_samples)
            window = ids[i * seq_len: j * seq_len].reshape(j - i, seq_len)
            tokens = jnp.asarray(window, jnp.int32)
            if mla_materialized:
                s, n = _window_nll_deepseek_materialized(params, tokens, cfg)
            else:
                s, n = _window_nll_deepseek(params, tokens, ga, gm, cfg)
            total_nll += float(s)
            total_tokens += int(n)
        return float(np.exp(total_nll / max(1, total_tokens)))

    L = cfg.num_layers
    ga = jnp.asarray(attn_gate, jnp.float32) if attn_gate is not None else jnp.ones((L,), jnp.float32)
    gm = jnp.asarray(mlp_gate, jnp.float32) if mlp_gate is not None else jnp.ones((L,), jnp.float32)
    nm = jnp.asarray(neuron_mask, jnp.float32) if neuron_mask is not None else jnp.ones((L, 1), jnp.float32)

    materialized = bool(cfg.pruned_attention_blocks)
    total_nll, total_tokens = 0.0, 0
    it = range(0, num_samples, batch_size)
    for i in it:
        j = min(i + batch_size, num_samples)
        window = ids[i * seq_len : j * seq_len].reshape(j - i, seq_len)
        tokens = jnp.asarray(window, jnp.int32)
        if materialized:
            s, n = _window_nll_materialized(params, tokens, cfg)
        else:
            s, n = _window_nll(params, tokens, ga, gm, nm, cfg)
        total_nll += float(s)
        total_tokens += int(n)
    return float(np.exp(total_nll / max(1, total_tokens)))


def evaluation_ppl(params, cfg, wikitext_ids, c4_ids, fineweb_ids, seq_len=2048,
                   attn_gate=None, mlp_gate=None):
    """Three-corpus perplexity suite (reference src/evaluation.py:9-17)."""
    import logging

    out = {}
    for name, ids in (("wikitext2", wikitext_ids), ("c4", c4_ids), ("fineweb-edu", fineweb_ids)):
        if ids is None:
            continue
        ppl = evaluate_perplexity(params, cfg, ids, seq_len=seq_len,
                                  attn_gate=attn_gate, mlp_gate=mlp_gate)
        logging.info(f"Perplexity ({name}): {ppl}")
        out[name] = ppl
    return out


def evaluate_inference_time(params, cfg: LlamaConfig, sample: np.ndarray,
                            warmup: int = 10, iters: int = 10) -> float:
    """Mean forward latency (ms) over a sample (reference src/evaluation.py:119-146),
    using the in-graph scan harness (docs/tpu_notes.md)."""
    from ssp_x_vit_tpu.evaluation.latency import measure_latency_scan
    from ssp_x_vit_tpu.llm.deepseek import (DeepseekConfig, deepseek_forward,
                                            deepseek_forward_materialized)

    tokens = jnp.asarray(np.asarray(sample).reshape(1, -1), jnp.int32)
    materialized = bool(cfg.pruned_attention_blocks)

    if isinstance(cfg, DeepseekConfig):
        fwd_fn = (deepseek_forward_materialized if materialized
                  else deepseek_forward)

        def fwd(tokens, params):
            return fwd_fn(params, tokens, cfg)
    elif materialized:
        def fwd(tokens, params):
            return llama_forward_materialized(params, tokens, cfg)
    else:
        def fwd(tokens, params):
            return llama_forward(params, tokens, cfg)[0]

    return measure_latency_scan(fwd, tokens, params, iters=max(1, iters), warmup=1)
