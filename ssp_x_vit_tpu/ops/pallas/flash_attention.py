"""Pallas TPU flash attention for the ViT/LLM forward pass.

Design: grid over (batch*heads, q-blocks); each program holds a 128-row query
tile and the FULL key/value sequence in VMEM. For this framework's sequence
lengths (ViT: 197 -> padded 256; LLM calibration: 2048) K/V VMEM residency is
a few hundred KB to ~1 MB, so the single-pass softmax (no online-softmax
streaming state) is both simpler and faster than the streaming variant — the
logits tile never round-trips to HBM, which is the entire point of flash
attention. Sequences past the VMEM budget (~12k at hd=128 bf16) dispatch to
the STREAMING kernel (grid over k-blocks, online-softmax scratch state) —
single-chip long context beyond the reference workloads (SURVEY.md §5.7);
multi-chip long context is ring attention (parallel/ring_attention.py).

Backward pass: ``jax.custom_vjp`` with a pallas single-pass backward kernel
in the q-tiled regime (s > MULTIHEAD_MAX_SEQ) — the XLA fallback there
materializes the [b, h, s, s] logits twice (recompute + grad), ~2 GB f32 at
LLM calibration shapes (b=4 h=32 s=2048). Short sequences keep the jnp
reference's autodiff (XLA fusion already wins the forward A/B there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssp_x_vit_tpu.ops.attention import sdpa_reference

BLOCK_Q = 128
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int,
                  causal: bool, window, softcap=None):
    # Grid: (batch*kv_heads, group member, q-tile) — GQA shares the
    # VMEM-resident K/V across the whole query group without ever
    # materializing repeated K/V in HBM. MHA is the rep=1 special case.
    iq = pl.program_id(2)

    q = q_ref[0, 0]  # [BLOCK_Q, hd]
    k = k_ref[0]     # [S_pad, hd]
    v = v_ref[0]     # [S_pad, hd]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BLOCK_Q, S_pad]
    if softcap is not None:  # gemma-2 attn logit soft-capping
        logits = softcap * jnp.tanh(logits / softcap)

    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    mask = col < seq_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + iq * BLOCK_Q
        mask = jnp.logical_and(mask, col <= row)
        if window is not None:
            # sliding window (HF convention): row - col < window
            mask = jnp.logical_and(mask, row - col < window)
    logits = jnp.where(mask, logits, _NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    # Measured micro-opts (docs/tpu_notes.md): exp STAYS f32 — a bf16 exp
    # variant ran 7.07 vs 6.09 ms (Mosaic widens transcendentals, so the
    # casts are pure overhead). The softmax divide IS folded to after the
    # PV matmul: [BLOCK_Q, hd] divides instead of [BLOCK_Q, S_pad].
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (pv / denom).astype(o_ref.dtype)


# K-block width for the causal BLOCK-SKIP kernel below. 512 measured best of
# the tried widths (128: 10.4 ms, 512: 7.44 ms at b=4 h=32 s=2048 hd=128) —
# but the full-rectangle kernel still beats it (5.80 ms), so block-skip is
# OPT-IN (SSP_X_VIT_FLASH_BLOCK_SKIP=1), kept as a measured negative result.
# On this chip the kernel is transcendental/VPU-bound, and the per-block
# online-softmax rescales + predication overhead cost more than the skipped
# upper-triangular MXU work saves. For comparison, the jax-shipped TPU
# kernels measured far slower still at these dims (official flash 13.8 ms,
# splash 17.8 ms, XLA sdpa 10.0 ms — scripts/bench_flash_causal.py).
BLOCK_K = 512


def _use_block_skip() -> bool:
    import os

    return os.environ.get("SSP_X_VIT_FLASH_BLOCK_SKIP") in ("1", "true", "True")


def _flash_kernel_causal(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                         *, scale: float, seq_len: int, s_pad: int):
    """Causal q-tile program that skips K/V blocks strictly above the
    diagonal. The non-causal kernel (`_flash_kernel`) computes the full
    [BLOCK_Q, S] logits rectangle and masks — for causal attention that
    wastes roughly half the MXU matmul work AND half the softmax
    transcendentals (the dominant cost at these shapes). Design notes from
    on-chip measurement (scripts/bench_flash_causal.py, docs/tpu_notes.md):

    - The block loop is PYTHON-UNROLLED with a ``pl.when`` predicate per
      block rather than a ``fori_loop(0, iq+1)``: a dynamic-trip-count loop
      at BLOCK_K=128 measured 10.4 ms vs the rectangle's 6.2 — per-iteration
      overhead and 16 online rescales ate the savings.
    - BLOCK_K=512 keeps the rescale count ≤ s_pad/512 per tile while still
      skipping the upper-triangular blocks.
    - ``exp`` runs in the INPUT dtype when it is bfloat16 (p is cast to
      bf16 for the PV matmul anyway); the VPU packs bf16 transcendentals
      2x, and the kernel is transcendental-bound. f32 inputs keep f32 exp
      so the interpret-mode parity tests stay at reference tolerance.

    K/V stay fully VMEM-resident per (batch*head); online-softmax state
    (m, l, acc) is carried in f32.
    """
    iq = pl.program_id(2)

    q = q_ref[0, 0]  # [BLOCK_Q, hd]
    exp_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32

    m_ref[:] = jnp.full(m_ref.shape, _NEG_INF, jnp.float32)
    l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_Q, BLOCK_K), 0) + iq * BLOCK_Q
    for j in range(s_pad // BLOCK_K):
        # Block j is needed iff its first column is <= the tile's last row
        # index; `pl.when` makes the skip a real runtime branch (no MXU or
        # exp work issued for strictly-upper-triangular blocks).
        @pl.when(j * BLOCK_K <= iq * BLOCK_Q + (BLOCK_Q - 1))
        def _(j=j):
            k_blk = k_ref[0, j * BLOCK_K:(j + 1) * BLOCK_K, :]
            v_blk = v_ref[0, j * BLOCK_K:(j + 1) * BLOCK_K, :]
            logits = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [BLOCK_Q, BLOCK_K]
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * BLOCK_K
            mask = jnp.logical_and(col <= row, col < seq_len)
            logits = jnp.where(mask, logits, _NEG_INF)
            m = m_ref[:]
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp((logits - m_new).astype(exp_dtype)).astype(jnp.float32)
            l_new = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[:] = m_new
            l_ref[:] = l_new
            acc_ref[:] = acc_new

    o_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


# K-block width for the STREAMING kernel (K/V never fully VMEM-resident —
# blocks stream from HBM through the pipeline). Sequences beyond the
# resident kernel's VMEM budget (~12k at hd=128 bf16) dispatch here; below
# it the resident rectangle kernel wins (block-skip A/B showed per-block
# online-softmax overhead loses when residency is affordable).
BLOCK_KS = 512


def _flash_kernel_streaming(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *,
                            scale: float, seq_len: int, causal: bool, nk: int,
                            window, softcap=None):
    """Grid (batch*kv_heads, group member, q-tile, k-block): the q tile stays
    resident across the innermost k-block axis while BLOCK_KS-wide K/V
    blocks stream through double-buffered VMEM windows; online-softmax state
    (m, l, acc) lives in scratch that persists across the sequential grid.
    Causal upper-triangular k-blocks are predicated off entirely (no MXU or
    exp work) — and with a sliding window, so are blocks entirely BELOW the
    band: long-context SWA work is O(s*window), not O(s^2/2). Unbounded in
    s — HBM is the only limit."""
    iq = pl.program_id(2)
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _():
        m_s[:] = jnp.full(m_s.shape, _NEG_INF, jnp.float32)
        l_s[:] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[:] = jnp.zeros(acc_s.shape, jnp.float32)

    needed = True
    if causal:
        needed = kb * BLOCK_KS <= iq * BLOCK_Q + (BLOCK_Q - 1)
        if window is not None:
            # block's last col must reach the tile's lowest in-window col
            needed = jnp.logical_and(
                needed, (kb + 1) * BLOCK_KS - 1 >= iq * BLOCK_Q - (window - 1))

    @pl.when(needed)
    def _():
        q = q_ref[0, 0]  # [BLOCK_Q, hd]
        k = k_ref[0]     # [BLOCK_KS, hd]
        v = v_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BLOCK_Q, BLOCK_KS]
        if softcap is not None:
            logits = softcap * jnp.tanh(logits / softcap)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + kb * BLOCK_KS
        mask = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + iq * BLOCK_Q
            mask = jnp.logical_and(mask, col <= row)
            if window is not None:
                mask = jnp.logical_and(mask, row - col < window)
        logits = jnp.where(mask, logits, _NEG_INF)

        m_old = m_s[:]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_s[:] = m_new

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0, 0] = (acc_s[:] / l_s[:]).astype(o_ref.dtype)


def _flash_forward_streaming(q, k, v, *, causal: bool, window=None,
                             softcap=None):
    b, h, s, hd = q.shape
    hkv = k.shape[1]
    rep = h // hkv
    scale = 1.0 / (hd**0.5)
    s_pad = -(-s // BLOCK_KS) * BLOCK_KS  # BLOCK_KS is a BLOCK_Q multiple

    def pad_q(t):
        t = t.reshape(b * hkv, rep, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return t

    def pad_kv(t):
        t = t.reshape(b * hkv, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        return t

    qf, kf, vf = pad_q(q), pad_kv(k), pad_kv(v)
    nq, nk = s_pad // BLOCK_Q, s_pad // BLOCK_KS

    q_spec = pl.BlockSpec((1, 1, BLOCK_Q, hd),
                          lambda bh, r, iq, kb: (bh, r, iq, 0),
                          memory_space=pltpu.VMEM)
    if causal:
        # Clamp predicated-off k-blocks (upper triangle, and below the
        # sliding-window band) to the nearest needed block index: pallas
        # skips the re-fetch when the mapped index repeats, so the skipped
        # blocks cost no HBM bandwidth either (the pl.when in the kernel
        # already skips their compute).
        def kv_index(bh, r, iq, kb):
            last_needed = (iq * BLOCK_Q + (BLOCK_Q - 1)) // BLOCK_KS
            idx = jnp.minimum(kb, last_needed)
            if window is not None:
                first_needed = jnp.maximum(
                    iq * BLOCK_Q - (window - 1), 0) // BLOCK_KS
                idx = jnp.maximum(idx, first_needed)
            return (bh, idx, 0)
    else:
        def kv_index(bh, r, iq, kb):
            return (bh, kb, 0)
    kv_spec = pl.BlockSpec((1, BLOCK_KS, hd), kv_index,
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_streaming, scale=scale, seq_len=s,
                          causal=causal, nk=nk, window=window,
                          softcap=softcap),
        grid=(b * hkv, rep, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * hkv, rep, s_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 if causal else 4) * b * h * s_pad * s_pad * hd,
            bytes_accessed=(2 * b * h + 2 * b * hkv * nq * rep) * s_pad * hd
            * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad // (2 if causal else 1),
        ),
    )(qf, kf, vf)

    return out[:, :, :s, :].reshape(b, h, s, hd)


# Batch elements grouped per program for short sequences (amortizes program
# and DMA overhead across G*H head-attentions). 2 is the VMEM-safe maximum at
# ViT-B dims (4 doubles the resident q/k/v/o buffers past the 16MB scoped
# limit); measured 5.55ms (g=1) -> 4.96ms (g=2) vs XLA 3.79ms at b=256 s=197,
# so XLA stays the dispatch default below FLASH_MIN_SEQ.
GROUP_BATCH = 2


def _multihead_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int,
                      num_heads: int, causal: bool, group: int, window,
                      softcap=None):
    """One program per GROUP of batch elements; loops over (image, head) pairs
    with K/V resident. For short sequences (ViT: 197->256) per-(batch,head)
    programs are dominated by program/DMA overhead — fatter programs win.
    """
    def head_body(i, _):
        g = i // num_heads
        h = i % num_heads
        q = q_ref[g, h]  # [S_pad, hd]
        k = k_ref[g, h]
        v = v_ref[g, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if softcap is not None:
            logits = softcap * jnp.tanh(logits / softcap)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        mask = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            mask = jnp.logical_and(mask, col <= row)
            if window is not None:
                mask = jnp.logical_and(mask, row - col < window)
        logits = jnp.where(mask, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[g, h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group * num_heads, head_body, 0)


def _flash_forward_multihead(q, k, v, *, causal: bool, window=None,
                             softcap=None):
    b, h, s, hd = q.shape
    scale = 1.0 / (hd**0.5)
    s_pad = max(-(-s // 128) * 128, 128)
    group = GROUP_BATCH
    while b % group:
        group //= 2

    def pad(t):
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return t

    qf, kf, vf = pad(q), pad(k), pad(v)
    spec = pl.BlockSpec((group, h, s_pad, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_multihead_kernel, scale=scale, seq_len=s,
                          num_heads=h, causal=causal, group=group,
                          window=window, softcap=softcap),
        grid=(b // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * hd,
            bytes_accessed=4 * b * h * s_pad * hd * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(qf, kf, vf)
    return out[:, :, :s, :]


# Sequences at or below this length use the multihead (one-program-per-batch)
# kernel; longer ones use the q-tiled kernel (K/V still fully VMEM-resident).
MULTIHEAD_MAX_SEQ = 512


def _flash_forward(q, k, v, *, causal: bool, window=None, softcap=None):
    b, h, s, hd = q.shape
    hkv = k.shape[1]
    rep = h // hkv
    s_pad_mh = max(-(-s // 128) * 128, 128)
    # q/k/v/o buffers must fit scoped VMEM (double-buffered by the pipeline).
    mh_vmem = 2 * h * s_pad_mh * hd * q.dtype.itemsize * 4
    if rep == 1 and s <= MULTIHEAD_MAX_SEQ and mh_vmem <= 12 * 1024 * 1024:
        return _flash_forward_multihead(q, k, v, causal=causal, window=window,
                                        softcap=softcap)
    # The resident q-tiled kernel keeps full K/V in (double-buffered) VMEM;
    # past the budget (~12k tokens at hd=128 bf16) stream K/V blocks instead.
    resident_vmem = 4 * (-(-s // BLOCK_Q) * BLOCK_Q) * hd * k.dtype.itemsize
    # Sliding windows do NOT lower the streaming switch point: the A/B
    # (scripts/bench_flash_window.py, docs/tpu_notes.md) measured the
    # resident rectangle winning or tying every VMEM-eligible windowed shape
    # except s=8192/w=1024 (1.17x), while the old provisional
    # `s >= window + 2*BLOCK_KS` rule would have cost up to 2.1x
    # (s=6144/w=1024: streaming 10.3 ms vs resident 4.8). Dispatch on the
    # VMEM budget alone.
    # SSP_X_VIT_FLASH_STREAMING={force,never}: bench/debug override of the
    # resident-vs-streaming choice (read at TRACE time — A/B benches must
    # jax.clear_caches() between arms, CLAUDE.md). "never" still streams
    # past the VMEM budget (the resident kernel would not fit).
    import os

    stream_mode = os.environ.get("SSP_X_VIT_FLASH_STREAMING", "auto")
    want_stream = resident_vmem > 12 * 1024 * 1024
    if stream_mode == "force":
        want_stream = True
    if want_stream:
        return _flash_forward_streaming(q, k, v, causal=causal, window=window,
                                        softcap=softcap)
    scale = 1.0 / (hd**0.5)
    block_skip = (causal and rep == 1 and window is None and softcap is None
                  and _use_block_skip())
    # The block-skip kernel unrolls K blocks of BLOCK_K, so pad the sequence
    # to a BLOCK_K multiple there (fully-masked padding blocks are exact
    # no-ops in the online-softmax update).
    s_unit = BLOCK_K if block_skip else BLOCK_Q
    s_pad = -(-s // s_unit) * s_unit

    def pad_q(t):
        # [b, hkv*rep, s, hd] -> [b*hkv, rep, s_pad, hd]: group members ride
        # a leading tile axis so each shares its kv-head's resident K/V.
        t = t.reshape(b * hkv, rep, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return t

    def pad_kv(t):
        t = t.reshape(b * hkv, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        return t

    qf, kf, vf = pad_q(q), pad_kv(k), pad_kv(v)
    nq = s_pad // BLOCK_Q

    if block_skip:
        kernel = functools.partial(_flash_kernel_causal, scale=scale,
                                   seq_len=s, s_pad=s_pad)
        flops = 2 * b * h * s_pad * s_pad * hd  # lower-triangular blocks only
        transcendentals = b * h * s_pad * s_pad // 2
        scratch = [
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, hd), jnp.float32),
        ]
    else:
        kernel = functools.partial(_flash_kernel, scale=scale, seq_len=s,
                                   causal=causal, window=window,
                                   softcap=softcap)
        flops = 4 * b * h * s_pad * s_pad * hd
        transcendentals = b * h * s_pad * s_pad
        scratch = []
    q_spec = pl.BlockSpec((1, 1, BLOCK_Q, hd),
                          lambda bh, r, iq: (bh, r, iq, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s_pad, hd), lambda bh, r, iq: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b * hkv, rep, nq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * hkv, rep, s_pad, hd), q.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * b * h * s_pad * hd + 2 * b * hkv * s_pad * hd) * q.dtype.itemsize,
            transcendentals=transcendentals,
        ),
    )(qf, kf, vf)

    return out[:, :, :s, :].reshape(b, h, s, hd)


def _flash_bwd_kernel(q_ref, do_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref,
                      dk_acc, dv_acc, *, scale: float, seq_len: int,
                      causal: bool, rep: int, nq: int, window, softcap=None):
    """Single-pass backward: grid (batch*heads, q-tiles), full K/V resident.

    The softmax row is RECOMPUTED from the resident full row (same rationale
    as the forward rectangle kernel — no online-softmax state), so the
    forward saves only (q, k, v): no logsumexp side-output, and no attention
    output O either, because the softmax-jacobian row term folds to
    ``delta_i = sum_j P_ij * dP_ij`` (== rowsum(dO*O)) with the full row in
    registers. That also sidesteps Mosaic's awkward [BQ,1]<->[1,BQ] relayout
    a stored-lse design would need (docs/tpu_notes.md lane-alignment note).

    dk/dv accumulate across q-tiles in f32 VMEM scratch — TPU grids execute
    sequentially, so revisiting the (bh,)-indexed output block is safe; the
    cast+store happens once on the last q-tile. All five matmuls
    (logits, dp, dq, dk, dv) are MXU dot_generals with no explicit
    transposes (dk/dv contract over the q-row dimension directly).

    GQA: grid (batch*kv_heads, group member, q-tile); the f32 dk/dv
    accumulators keep summing across the WHOLE group before the final
    store — exactly the repeat-vjp group-sum, with no repeated K/V in HBM.
    """
    r = pl.program_id(1)
    iq = pl.program_id(2)
    first = jnp.logical_and(r == 0, iq == 0)
    last = jnp.logical_and(r == rep - 1, iq == nq - 1)

    q = q_ref[0, 0]    # [BLOCK_Q, hd]
    do = do_ref[0, 0]  # [BLOCK_Q, hd]
    k = k_ref[0]       # [S_pad, hd]
    v = v_ref[0]       # [S_pad, hd]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BLOCK_Q, S_pad]
    if softcap is not None:
        # gemma-2 soft-capping: c = cap*tanh(z/cap). The softmax runs on the
        # capped logits; the chain rule multiplies ds by dc/dz = 1 - t^2
        # (recomputed tanh, same recompute-over-store rationale as p).
        tcap = jnp.tanh(logits / softcap)
        logits = softcap * tcap
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    mask = col < seq_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + iq * BLOCK_Q
        mask = jnp.logical_and(mask, col <= row)
        if window is not None:
            mask = jnp.logical_and(mask, row - col < window)
    logits = jnp.where(mask, logits, _NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    # denom guard: with a sliding window, PADDING rows past seq_len can be
    # FULLY masked (row - window + 1 >= seq_len) — 0/0 NaN here would ride
    # the dk/dv accumulation into real rows (do=0 kills finite p, not NaN).
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BLOCK_Q, S_pad]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # == rowsum(dO * O)
    ds = p * (dp - delta)  # [BLOCK_Q, S_pad]
    if softcap is not None:
        ds = ds * (1.0 - tcap * tcap)

    dq_ref[0, 0] = (jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)

    # dk[j,:] = scale * sum_i ds[i,j] q[i,:]; dv[j,:] = sum_i p[i,j] do[i,:]
    dk_tile = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [S_pad, hd]
    dv_tile = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S_pad, hd]

    @pl.when(first)
    def _():
        dk_acc[:] = dk_tile
        dv_acc[:] = dv_tile

    @pl.when(jnp.logical_not(first))
    def _():
        dk_acc[:] += dk_tile
        dv_acc[:] += dv_tile

    @pl.when(last)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward_pallas(q, k, v, g, *, causal: bool, window=None,
                           softcap=None):
    b, h, s, hd = q.shape
    hkv = k.shape[1]
    rep = h // hkv
    scale = 1.0 / (hd**0.5)
    s_pad = -(-s // BLOCK_Q) * BLOCK_Q

    def pad_q(t):
        t = t.reshape(b * hkv, rep, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return t

    def pad_kv(t):
        t = t.reshape(b * hkv, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        return t

    qf, gf, kf, vf = pad_q(q), pad_q(g), pad_kv(k), pad_kv(v)
    nq = s_pad // BLOCK_Q

    tile_spec = pl.BlockSpec((1, 1, BLOCK_Q, hd),
                             lambda bh, r, iq: (bh, r, iq, 0),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, s_pad, hd), lambda bh, r, iq: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, seq_len=s,
                          causal=causal, rep=rep, nq=nq, window=window,
                          softcap=softcap),
        grid=(b * hkv, rep, nq),
        in_specs=[tile_spec, tile_spec, full_spec, full_spec],
        out_specs=[tile_spec, full_spec, full_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * hkv, rep, s_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b * hkv, s_pad, hd), k.dtype),
            jax.ShapeDtypeStruct((b * hkv, s_pad, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_pad, hd), jnp.float32),
            pltpu.VMEM((s_pad, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s_pad * s_pad * hd,
            bytes_accessed=(5 * b * h + 4 * b * hkv) * s_pad * hd * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(qf, gf, kf, vf)

    unpad_q = lambda t: t[:, :, :s, :].reshape(b, h, s, hd)
    unpad_kv = lambda t: t[:, :s, :].reshape(b, hkv, s, hd)
    return unpad_q(dq), unpad_kv(dk), unpad_kv(dv)


def _flash_bwd_dq_kernel(q_ref, do_ref, k_ref, v_ref,
                         dq_ref, lse_ref, delta_ref,
                         m_s, l_s, d_s, acc_s, *, scale: float, seq_len: int,
                         causal: bool, nk: int, window, softcap=None):
    """Streaming dq: grid (batch*kv_heads, group, q-tile, 3*nk). The inner
    axis makes THREE k-block sweeps per q-tile — phase 0 accumulates the
    online row max/sum (m, l), phase 1 the softmax-jacobian row term
    delta = sum_j P_ij dP_ij, phase 2 dq = scale * sum ds @ K — so no
    row statistics ever cross a kernel boundary in the awkward
    sublane-vector layout. The final phase also EMITS lse and delta as
    lane-BROADCAST [BLOCK_Q, 128] blocks for the dk/dv kernel to consume
    in its natural q-rows-as-sublanes orientation (a [BQ,1]<->[1,BQ]
    relayout is the one thing Mosaic makes painful; a lane-broadcast is
    free)."""
    iq = pl.program_id(2)
    step = pl.program_id(3)
    phase = step // nk
    kb = step % nk

    @pl.when(step == 0)
    def _():
        m_s[:] = jnp.full(m_s.shape, _NEG_INF, jnp.float32)
        l_s[:] = jnp.zeros(l_s.shape, jnp.float32)
        d_s[:] = jnp.zeros(d_s.shape, jnp.float32)
        acc_s[:] = jnp.zeros(acc_s.shape, jnp.float32)

    needed = True
    if causal:
        needed = kb * BLOCK_KS <= iq * BLOCK_Q + (BLOCK_Q - 1)
        if window is not None:
            needed = jnp.logical_and(
                needed, (kb + 1) * BLOCK_KS - 1 >= iq * BLOCK_Q - (window - 1))

    @pl.when(needed)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BLOCK_Q, BLOCK_KS]
        if softcap is not None:
            tcap = jnp.tanh(logits / softcap)
            logits = softcap * tcap
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + kb * BLOCK_KS
        mask = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + iq * BLOCK_Q
            mask = jnp.logical_and(mask, col <= row)
            if window is not None:
                mask = jnp.logical_and(mask, row - col < window)
        logits = jnp.where(mask, logits, _NEG_INF)

        @pl.when(phase == 0)
        def _():
            m_s[:] = jnp.maximum(m_s[:], jnp.max(logits, axis=-1, keepdims=True))
            # l accumulates against the FINAL m, so sum exp in phase 1 instead

        @pl.when(phase >= 1)
        def _():
            do = do_ref[0, 0]
            v = v_ref[0]
            p = jnp.exp(logits - m_s[:])  # final m: no rescaling needed
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(phase == 1)
            def _():
                l_s[:] += jnp.sum(p, axis=-1, keepdims=True)
                d_s[:] += jnp.sum(p * dp, axis=-1, keepdims=True)

            @pl.when(phase == 2)
            def _():
                # delta term normalized by the row sum only now that both
                # l and the raw d accumulator are complete
                pn = p / l_s[:]
                ds = pn * (dp - d_s[:] / l_s[:])
                if softcap is not None:
                    ds = ds * (1.0 - tcap * tcap)
                acc_s[:] += jax.lax.dot_general(
                    ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    @pl.when(step == 3 * nk - 1)
    def _():
        dq_ref[0, 0] = (acc_s[:] * scale).astype(dq_ref.dtype)
        lse = m_s[:] + jnp.log(l_s[:])
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])
        delta_ref[0, 0] = jnp.broadcast_to(d_s[:] / l_s[:], delta_ref.shape[2:])


def _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                          seq_len: int, causal: bool, rep: int, nq: int,
                          window, softcap=None):
    """Streaming dk/dv: grid (batch*kv_heads, k-block, group, q-tile). The
    K/V block stays resident while q/do/lse/delta tiles stream; f32
    accumulators sum contributions over the whole (group x q-tile) sweep —
    consecutive output revisits, the supported TPU pattern. Same
    transpose-free contractions as the resident backward."""
    kb = pl.program_id(1)
    r = pl.program_id(2)
    iq = pl.program_id(3)
    first = jnp.logical_and(r == 0, iq == 0)
    last = jnp.logical_and(r == rep - 1, iq == nq - 1)

    @pl.when(first)
    def _():
        dk_acc[:] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[:] = jnp.zeros(dv_acc.shape, jnp.float32)

    needed = True
    if causal:
        # q-tile contributes to k-block kb iff its last row reaches the block
        needed = iq * BLOCK_Q + (BLOCK_Q - 1) >= kb * BLOCK_KS
        if window is not None:
            # ... and its first row is still inside the band for the block's
            # last column: row - col < window for some (row, col) pair
            needed = jnp.logical_and(
                needed, iq * BLOCK_Q - ((kb + 1) * BLOCK_KS - 1) < window)

    @pl.when(needed)
    def _():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]      # [BLOCK_Q, 1] from the broadcast
        delta = delta_ref[0, 0][:, :1]
        k = k_ref[0]
        v = v_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if softcap is not None:
            tcap = jnp.tanh(logits / softcap)
            logits = softcap * tcap
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + kb * BLOCK_KS
        mask = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + iq * BLOCK_Q
            mask = jnp.logical_and(mask, col <= row)
            if window is not None:
                mask = jnp.logical_and(mask, row - col < window)
        logits = jnp.where(mask, logits, _NEG_INF)
        p = jnp.exp(logits - lse)  # normalized probabilities directly
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if softcap is not None:
            ds = ds * (1.0 - tcap * tcap)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(last)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward_streaming(q, k, v, g, *, causal: bool, window=None,
                              softcap=None):
    """Two-pass streaming backward for sequences past the resident VMEM
    budget: HBM-bound like the streaming forward. Intermediate lse/delta
    ride a lane-broadcast [..., s_pad, 128] f32 layout (s_pad*512 bytes per
    (kv-head, group) — transient, freed after the dkv pass)."""
    b, h, s, hd = q.shape
    hkv = k.shape[1]
    rep = h // hkv
    scale = 1.0 / (hd**0.5)
    s_pad = -(-s // BLOCK_KS) * BLOCK_KS

    def pad_q(t):
        t = t.reshape(b * hkv, rep, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return t

    def pad_kv(t):
        t = t.reshape(b * hkv, s, hd)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        return t

    qf, gf, kf, vf = pad_q(q), pad_q(g), pad_kv(k), pad_kv(v)
    nq, nk = s_pad // BLOCK_Q, s_pad // BLOCK_KS

    tile = pl.BlockSpec((1, 1, BLOCK_Q, hd),
                        lambda bh, r, iq, st: (bh, r, iq, 0),
                        memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, 1, BLOCK_Q, 128),
                        lambda bh, r, iq, st: (bh, r, iq, 0),
                        memory_space=pltpu.VMEM)
    if causal:
        def kv_index(bh, r, iq, st):
            last_needed = (iq * BLOCK_Q + (BLOCK_Q - 1)) // BLOCK_KS
            idx = jnp.minimum(st % nk, last_needed)
            if window is not None:
                first_needed = jnp.maximum(
                    iq * BLOCK_Q - (window - 1), 0) // BLOCK_KS
                idx = jnp.maximum(idx, first_needed)
            return (bh, idx, 0)
    else:
        def kv_index(bh, r, iq, st):
            return (bh, st % nk, 0)
    kv = pl.BlockSpec((1, BLOCK_KS, hd), kv_index, memory_space=pltpu.VMEM)

    dq, lse, delta = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, seq_len=s,
                          causal=causal, nk=nk, window=window,
                          softcap=softcap),
        grid=(b * hkv, rep, nq, 3 * nk),
        in_specs=[tile, tile, kv, kv],
        out_specs=[tile, stat, stat],
        out_shape=[
            jax.ShapeDtypeStruct((b * hkv, rep, s_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b * hkv, rep, s_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * hkv, rep, s_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * s_pad * s_pad * hd,
            bytes_accessed=(3 * b * h + 6 * b * hkv * rep * nq) * s_pad * hd
            * q.dtype.itemsize,
            transcendentals=2 * b * h * s_pad * s_pad,
        ),
    )(qf, gf, kf, vf)

    tile2 = pl.BlockSpec((1, 1, BLOCK_Q, hd),
                         lambda bh, kb, r, iq: (bh, r, iq, 0),
                         memory_space=pltpu.VMEM)
    stat2 = pl.BlockSpec((1, 1, BLOCK_Q, 128),
                         lambda bh, kb, r, iq: (bh, r, iq, 0),
                         memory_space=pltpu.VMEM)
    kv2 = pl.BlockSpec((1, BLOCK_KS, hd), lambda bh, kb, r, iq: (bh, kb, 0),
                       memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, seq_len=s,
                          causal=causal, rep=rep, nq=nq, window=window,
                          softcap=softcap),
        grid=(b * hkv, nk, rep, nq),
        in_specs=[tile2, tile2, stat2, stat2, kv2, kv2],
        out_specs=[kv2, kv2],
        out_shape=[
            jax.ShapeDtypeStruct((b * hkv, s_pad, hd), k.dtype),
            jax.ShapeDtypeStruct((b * hkv, s_pad, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_KS, hd), jnp.float32),
            pltpu.VMEM((BLOCK_KS, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * s_pad * s_pad * hd,
            bytes_accessed=(4 * b * h * nk + 4 * b * hkv) * s_pad * hd
            * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(qf, gf, lse, delta, kf, vf)

    unpad_q = lambda t: t[:, :, :s, :].reshape(b, h, s, hd)
    unpad_kv = lambda t: t[:, :s, :].reshape(b, hkv, s, hd)
    return unpad_q(dq), unpad_kv(dk), unpad_kv(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, causal, window, softcap):
    return _flash_forward(q, k, v, causal=causal, window=window,
                          softcap=softcap)


def _flash_fwd(q, k, v, causal, window, softcap):
    return (_flash_forward(q, k, v, causal=causal, window=window,
                           softcap=softcap), (q, k, v))


def _flash_bwd(causal, window, softcap, res, g):
    q, k, v = res
    b, h, s, hd = q.shape
    rep = h // k.shape[1]
    # The pallas backward mirrors the q-tiled forward's regime (full K/V VMEM
    # residency, plus two f32 [S_pad, hd] accumulators). Short MHA sequences
    # take the XLA autodiff of the reference — at those sizes the [s,s]
    # logits round-trip is cheap and XLA's fusion already won the forward
    # A/B. GQA takes the pallas kernel (matching the forward path). Past the
    # resident VMEM budget, the STREAMING backward takes over — the XLA
    # fallback would materialize [b, h, s, s] f32 logits (8.6 GB at s=16k),
    # an opaque OOM.
    s_pad = -(-s // BLOCK_Q) * BLOCK_Q
    # Per-program VMEM: double-buffered k/v inputs + dk/dv outputs (4 full
    # [S_pad, hd] buffers x2), 3 input/output q-tiles (negligible but
    # counted via the 3x term), and two f32 accumulator scratches.
    isz = q.dtype.itemsize
    bwd_vmem = (4 * isz + 2 * 4 + 3 * isz) * s_pad * hd + 2 * 4 * s_pad * hd
    # Soft-capped backward: all three pallas backward kernels carry the tanh
    # chain rule (ds *= 1 - tanh^2(z/cap), tanh recomputed with the logits),
    # so gemma-2 long-context training never materializes [b, h, s, s].
    if rep > 1 or s > MULTIHEAD_MAX_SEQ:
        # Windows do not lower the streaming switch point here either: the
        # clause only ever bound at s_pad <= 3072 (past that bwd_vmem forces
        # streaming anyway), and the A/B at s=3072/w=1024 measured the
        # resident backward 1.34x FASTER (4.69 vs 6.29 ms; tpu_notes).
        if bwd_vmem <= 12 * 1024 * 1024:
            return _flash_backward_pallas(q, k, v, g, causal=causal,
                                          window=window, softcap=softcap)
        return _flash_backward_streaming(q, k, v, g, causal=causal,
                                         window=window, softcap=softcap)

    def ref(q_, k_, v_):
        if rep > 1:
            k_ = jnp.repeat(k_, rep, axis=1)
            v_ = jnp.repeat(v_, rep, axis=1)
        return sdpa_reference(q_, k_, v_, causal=causal, window=window,
                              softcap=softcap)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, window=None,
                    softcap=None) -> jax.Array:
    """q [b, h, s, hd], k/v [b, hkv, s, hd] -> [b, h, s, hd].

    GQA-native: when hkv < h (h % hkv == 0), each query group shares its
    kv-head's VMEM-resident K/V inside the kernel — callers must NOT
    pre-repeat K/V (that would re-materialize them rep x in HBM). Numerics
    match ``sdpa_reference`` on repeated K/V; grads flow to the [b, hkv]
    shapes (the group-sum happens in-kernel).

    ``window`` adds sliding-window attention (mistral, HF convention:
    row - col < window; requires ``causal=True``). Long sequences ride the
    streaming kernels with out-of-band k-blocks predicated off — O(s*window)
    work and bandwidth instead of O(s^2/2).
    """
    if q.shape[1] % k.shape[1]:
        raise ValueError(
            f"num_heads {q.shape[1]} not a multiple of num_kv_heads {k.shape[1]}")
    if window is not None:
        if not causal:
            raise ValueError("sliding window requires causal attention")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if window >= q.shape[2]:
            window = None  # full causal within this sequence — same program
    return _flash(q, k, v, causal, window, softcap)
