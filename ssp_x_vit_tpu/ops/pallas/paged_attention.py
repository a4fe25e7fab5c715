"""Paged decode attention: KV cache in fixed-size pages + page tables.

The serving path's contiguous cache (llm/serve.py) allocates ``max_len`` slots
per sequence up front and forces all sequences in a batch onto one shared
write position (left-padding). Paged attention removes both constraints —
the vLLM design, TPU-native:

- K/V live in a physical page pool ``[nkv, num_pages, page_size, hd]``
  (per layer); a sequence owns an arbitrary set of pages via its row of the
  ``page_table [b, pages_per_seq]``.
- The decode kernel walks a sequence's pages with the page table in SMEM
  (``PrefetchScalarGridSpec`` scalar prefetch drives the K/V BlockSpec
  index_map — the DMA engine fetches exactly the pages the sequence owns),
  accumulating a flash-style online softmax across pages.
- Per-sequence lengths are independent: continuous batching admits/evicts
  requests without repadding or recompiling (llm/paged.py).

Grid: (batch, kv_head, page). The page axis is innermost/sequential, so the
softmax state (m, l, acc) lives in VMEM scratch across page steps; the
GQA query group for one kv head ([group, hd]) stays resident.

The reference has no serving machinery at all; this extends the rebuild's
beyond-reference serve path (COVERAGE.md). jnp reference + pallas kernel
share one contract, dispatch-gated like every other kernel here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _dequant_pages(pages):
    """{"q" int8 [nkv,P,ps,hd], "s" f32 [nkv,P,ps]} -> f32 pages."""
    return pages["q"].astype(jnp.float32) * pages["s"][..., None]


def _as_5d(k_pages, v_pages, layer_idx):
    """Normalize pools to [A, nkv, P, ps, hd] + a (1,)-shaped layer index
    for the scalar-prefetch index maps. 4D pools (single-layer callers,
    e.g. tests and the MLA absorbed path pre-refactor) become A=1 views —
    a bitcast, not a copy."""
    if layer_idx is None:
        exp = lambda a: a[None]
        k_pages = jax.tree.map(exp, k_pages)
        v_pages = jax.tree.map(exp, v_pages) if v_pages is not None else None
        li = jnp.zeros((1,), jnp.int32)
    else:
        li = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    return k_pages, v_pages, li


def _layer_of(pages, layer_idx):
    """Dynamic layer slice of a 5D pool (jnp reference paths only — the
    pallas kernels index the full pool through their BlockSpecs and never
    materialize this copy)."""
    if layer_idx is None:
        return pages
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0,
                                               keepdims=False), pages)


def paged_attention_reference(q, k_pages, v_pages, page_table, seq_lens,
                              start_lens=None, softcap=None):
    """Exact softmax over the paged cache (jnp; CPU/test path).

    q: [b, nq, hd] one query token per sequence;
    k_pages/v_pages: [nkv, P, ps, hd] — or int8 pool pytrees ({"q","s"},
    per-token-per-head scales; cf. serve.init_cache); page_table: [b, mp]
    int32 (entries for unused logical pages must be valid indices, e.g. 0);
    seq_lens: [b] valid cached tokens per sequence. ``start_lens`` [b] is an
    optional lower bound (sliding-window decode: keys below it are masked).
    Returns [b, nq, hd].
    """
    if isinstance(k_pages, dict):
        k_pages = _dequant_pages(k_pages).astype(q.dtype)
        v_pages = _dequant_pages(v_pages).astype(q.dtype)
    b, nq, hd = q.shape
    nkv, _, ps, _ = k_pages.shape
    mp = page_table.shape[1]
    rep = nq // nkv
    k = jnp.moveaxis(k_pages[:, page_table], 0, 1).reshape(b, nkv, mp * ps, hd)
    v = jnp.moveaxis(v_pages[:, page_table], 0, 1).reshape(b, nkv, mp * ps, hd)
    qh = q.reshape(b, nkv, rep, hd).astype(jnp.float32) * (1.0 / hd**0.5)
    scores = jnp.einsum("bkrd,bksd->bkrs", qh, k.astype(jnp.float32))
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    pos = jnp.arange(mp * ps)
    mask = pos[None, None, None, :] < seq_lens[:, None, None, None]
    if start_lens is not None:
        mask = mask & (pos[None, None, None, :] >= start_lens[:, None, None, None])
    scores = jnp.where(mask, scores, _NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkrs,bksd->bkrd", w, v.astype(jnp.float32))
    return out.reshape(b, nq, hd).astype(q.dtype)


def _paged_kernel(pt_ref, len_ref, st_ref, q_ref, k_ref, v_ref, o_ref,
                  m_s, l_s, acc_s, *, ps: int, mp: int, scale: float,
                  softcap=None):
    i = pl.program_id(0)       # batch (sequence)
    j = pl.program_id(2)       # page step (innermost -> scratch carries)

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    seq_len = len_ref[i]
    start = st_ref[i]  # sliding-window lower bound (0 = full causal)

    @pl.when(((j + 1) * ps > start) & (j * ps < seq_len))
    def _step():
        q = q_ref[0, 0].astype(jnp.float32)       # [group, hd]
        k = k_ref[0, 0]                           # [ps, hd]
        s = jax.lax.dot_general(
            q * scale, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [group, ps]
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        kpos = j * ps + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((kpos >= start) & (kpos < seq_len), s, _NEG_INF)
        m_prev, l_prev = m_s[...], l_s[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)        # [group, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                            # [group, ps]
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [group, hd]
        acc_s[...] = acc_s[...] * alpha + pv
        m_s[...] = m_new

    @pl.when(j == mp - 1)
    def _finish():
        o_ref[0, 0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


def _paged_kernel_grouped(pt_ref, len_ref, st_ref, li_ref, q_ref, k_ref,
                          v_ref, o_ref, m_s, l_s, acc_s, *, ps: int, mp: int,
                          nkv: int, rep: int, scale: float, softcap=None):
    """All kv heads of one (sequence, page) step in ONE program — 16x fewer
    program launches than the per-head grid; decode pages are tiny, so
    program/DMA overhead dominates (same reasoning as the multihead flash
    kernel, flash_attention.py:70)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    seq_len = len_ref[i]
    start = st_ref[i]  # sliding-window lower bound (0 = full causal)

    @pl.when(((j + 1) * ps > start) & (j * ps < seq_len))
    def _step():
        kpos1 = j * ps + jax.lax.broadcasted_iota(jnp.int32, (rep, ps), 1)

        def head_body(h, _):
            q = q_ref[0, h].astype(jnp.float32)           # [rep, hd]
            k = k_ref[h, 0]                               # [ps, hd]
            s = jax.lax.dot_general(
                q * scale, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [rep, ps]
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            s = jnp.where((kpos1 >= start) & (kpos1 < seq_len), s, _NEG_INF)
            sl = pl.ds(h * rep, rep)
            m_prev, l_prev = m_s[sl], l_s[sl]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_s[sl] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[h, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_s[sl] = acc_s[sl] * alpha + pv
            m_s[sl] = m_new
            return 0

        jax.lax.fori_loop(0, nkv, head_body, 0)

    @pl.when(j == mp - 1)
    def _finish():
        o_ref[0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


def _paged_pallas_grouped(q, k_pages, v_pages, page_table, seq_lens, start_lens,
                          softcap=None, layer_idx=None):
    """Pools are [A, nkv, P, ps, hd] with the layer picked by the
    scalar-prefetched ``layer_idx`` INSIDE the BlockSpec index maps (the
    leading dim is None-squeezed, so the kernel body is layout-agnostic).
    This is what lets the serving scans carry the whole multi-layer pool in
    place instead of slicing/stacking a 67 MB layer copy per step —
    measured 12 ms/step of pure pool shuffling at b=8/16 layers/2048 ctx
    (scripts/bench_paged_gap.py) before the carry refactor. 4D callers are
    normalized to A=1, layer_idx=0 (a bitcast view)."""
    k_pages, v_pages, li = _as_5d(k_pages, v_pages, layer_idx)
    b, nq, hd = q.shape
    _, nkv, num_pages, ps, _ = k_pages.shape
    mp = page_table.shape[1]
    rep = nq // nkv
    scale = 1.0 / hd**0.5
    qh = q.reshape(b, nkv, rep, hd)

    kernel = functools.partial(_paged_kernel_grouped, ps=ps, mp=mp, nkv=nkv,
                               rep=rep, scale=scale, softcap=softcap)
    kv_spec = pl.BlockSpec(
        (None, nkv, 1, ps, hd),
        lambda i, j, pt, ln, st, li: (li[0], 0, pt[i, j], 0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, mp),
        in_specs=[
            pl.BlockSpec((1, nkv, rep, hd),
                         lambda i, j, pt, ln, st, li: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=pl.BlockSpec((1, nq, hd),
                               lambda i, j, pt, ln, st, li: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nq, 1), jnp.float32),
            pltpu.VMEM((nq, 1), jnp.float32),
            pltpu.VMEM((nq, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * mp * ps * hd,
            bytes_accessed=2 * b * nkv * mp * ps * hd * k_pages.dtype.itemsize,
            transcendentals=b * nq * mp * ps,
        ),
    )(page_table.astype(jnp.int32), seq_lens.astype(jnp.int32),
      start_lens.astype(jnp.int32), li, qh, k_pages, v_pages)
    return out


def _paged_kernel_grouped_q8(pt_ref, len_ref, st_ref, li_ref, q_ref, k_ref,
                             ks_ref, v_ref, vs_ref, o_ref, m_s, l_s, acc_s,
                             *, ps: int, mp: int, nkv: int, rep: int,
                             scale: float, softcap=None):
    """int8-pool variant of the grouped kernel: per-token-per-head scales
    fold into the score (key side) and into the softmax weights (value
    side) — the K/V tiles stream as int8, HALF the page bytes."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    seq_len = len_ref[i]
    start = st_ref[i]  # sliding-window lower bound (0 = full causal)

    @pl.when(((j + 1) * ps > start) & (j * ps < seq_len))
    def _step():
        kpos1 = j * ps + jax.lax.broadcasted_iota(jnp.int32, (rep, ps), 1)

        def head_body(h, _):
            q = q_ref[0, h].astype(jnp.float32)           # [rep, hd]
            k = k_ref[h, 0].astype(jnp.float32)           # [ps, hd] int8->f32
            s = jax.lax.dot_general(
                q * scale, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [rep, ps]
            s = s * ks_ref[h, 0, 0][None, :]               # key dequant scale
            if softcap is not None:  # after FULL logit reconstruction
                s = softcap * jnp.tanh(s / softcap)
            s = jnp.where((kpos1 >= start) & (kpos1 < seq_len), s, _NEG_INF)
            sl = pl.ds(h * rep, rep)
            m_prev, l_prev = m_s[sl], l_s[sl]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_s[sl] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            p = p * vs_ref[h, 0, 0][None, :]               # value dequant scale
            pv = jax.lax.dot_general(
                p, v_ref[h, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_s[sl] = acc_s[sl] * alpha + pv
            m_s[sl] = m_new
            return 0

        jax.lax.fori_loop(0, nkv, head_body, 0)

    @pl.when(j == mp - 1)
    def _finish():
        o_ref[0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


def _paged_pallas_grouped_q8(q, k_pages, v_pages, page_table, seq_lens,
                             start_lens, softcap=None, layer_idx=None):
    k_pages, v_pages, li = _as_5d(k_pages, v_pages, layer_idx)
    b, nq, hd = q.shape
    _, nkv, num_pages, ps, _ = k_pages["q"].shape
    mp = page_table.shape[1]
    rep = nq // nkv
    scale = 1.0 / hd**0.5
    qh = q.reshape(b, nkv, rep, hd)

    kernel = functools.partial(_paged_kernel_grouped_q8, ps=ps, mp=mp,
                               nkv=nkv, rep=rep, scale=scale, softcap=softcap)
    kv_spec = pl.BlockSpec(
        (None, nkv, 1, ps, hd),
        lambda i, j, pt, ln, st, li: (li[0], 0, pt[i, j], 0, 0),
        memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec(
        (None, nkv, 1, 1, ps),
        lambda i, j, pt, ln, st, li: (li[0], 0, pt[i, j], 0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, mp),
        in_specs=[
            pl.BlockSpec((1, nkv, rep, hd),
                         lambda i, j, pt, ln, st, li: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((1, nq, hd),
                               lambda i, j, pt, ln, st, li: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nq, 1), jnp.float32),
            pltpu.VMEM((nq, 1), jnp.float32),
            pltpu.VMEM((nq, hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * mp * ps * hd,
            bytes_accessed=2 * b * nkv * mp * ps * (hd + 4),
            transcendentals=b * nq * mp * ps,
        ),
    )(page_table.astype(jnp.int32), seq_lens.astype(jnp.int32),
      start_lens.astype(jnp.int32), li, qh,
      k_pages["q"], k_pages["s"].astype(jnp.float32)[:, :, :, None, :],
      v_pages["q"], v_pages["s"].astype(jnp.float32)[:, :, :, None, :])


# Grouped-program VMEM budget: k+v blocks double-buffered + q/out.
_GROUPED_VMEM_LIMIT = 12 * 1024 * 1024


def paged_attention_pallas(q, k_pages, v_pages, page_table, seq_lens,
                           start_lens=None, softcap=None, layer_idx=None):
    """Pallas TPU paged decode attention; contract == the jnp reference.

    ``layer_idx`` selects the layer of 5D pools [A, nkv, P, ps, hd] inside
    the kernels' BlockSpec index maps (serving scans carry the whole pool
    in place); 4D pools keep the single-layer contract."""
    b, nq, hd = q.shape
    if start_lens is None:
        start_lens = jnp.zeros_like(seq_lens)  # 0 = full causal
    if isinstance(k_pages, dict):
        ps = (k_pages["q"].shape[3] if layer_idx is not None
              else k_pages["q"].shape[2])
        nkv = k_pages["q"].shape[1 if layer_idx is not None else 0]
        grouped_vmem = 2 * 2 * nkv * ps * (hd + 4)
        if grouped_vmem <= _GROUPED_VMEM_LIMIT:
            return _paged_pallas_grouped_q8(q, k_pages, v_pages, page_table,
                                            seq_lens, start_lens, softcap,
                                            layer_idx)
        return paged_attention_reference(q, _layer_of(k_pages, layer_idx),
                                         _layer_of(v_pages, layer_idx),
                                         page_table, seq_lens, start_lens,
                                         softcap)
    if layer_idx is not None:
        _, nkv, _, ps, _ = k_pages.shape
    else:
        nkv, _, ps, _ = k_pages.shape
    grouped_vmem = 2 * 2 * nkv * ps * hd * k_pages.dtype.itemsize
    if grouped_vmem <= _GROUPED_VMEM_LIMIT:
        return _paged_pallas_grouped(q, k_pages, v_pages, page_table, seq_lens,
                                     start_lens, softcap, layer_idx)
    return _paged_pallas_perhead(q, _layer_of(k_pages, layer_idx),
                                 _layer_of(v_pages, layer_idx), page_table,
                                 seq_lens, start_lens, softcap)


def _paged_pallas_perhead(q, k_pages, v_pages, page_table, seq_lens, start_lens,
                          softcap=None):
    """Per-(sequence, kv head, page) grid — fallback for huge pages."""
    b, nq, hd = q.shape
    nkv, num_pages, ps, _ = k_pages.shape
    mp = page_table.shape[1]
    rep = nq // nkv
    scale = 1.0 / hd**0.5
    qh = q.reshape(b, nkv, rep, hd)

    grid = (b, nkv, mp)
    kernel = functools.partial(_paged_kernel, ps=ps, mp=mp, scale=scale,
                               softcap=softcap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rep, hd), lambda i, h, j, pt, ln, st: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ps, hd), lambda i, h, j, pt, ln, st: (h, pt[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ps, hd), lambda i, h, j, pt, ln, st: (h, pt[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, hd), lambda i, h, j, pt, ln, st: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rep, 1), jnp.float32),    # m
            pltpu.VMEM((rep, 1), jnp.float32),    # l
            pltpu.VMEM((rep, hd), jnp.float32),   # acc
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, rep, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * mp * ps * hd,
            bytes_accessed=2 * b * nkv * mp * ps * hd * k_pages.dtype.itemsize,
            transcendentals=b * nq * mp * ps,
        ),
    )(page_table.astype(jnp.int32), seq_lens.astype(jnp.int32),
      start_lens.astype(jnp.int32), qh, k_pages, v_pages)
    return out.reshape(b, nq, hd)


def paged_attention(q, k_pages, v_pages, page_table, seq_lens,
                    start_lens=None, softcap=None, layer_idx=None):
    """Dispatch: pallas on TPU, jnp reference elsewhere. ``start_lens`` [b]
    masks keys below it (sliding-window decode; None = full causal);
    ``softcap`` = gemma-2 attention logit soft-capping (static);
    ``layer_idx`` selects the layer of 5D multi-layer pools (see
    paged_attention_pallas)."""
    from ssp_x_vit_tpu.ops.dispatch import use_pallas

    if use_pallas():
        return paged_attention_pallas(q, k_pages, v_pages, page_table,
                                      seq_lens, start_lens, softcap,
                                      layer_idx)
    return paged_attention_reference(q, _layer_of(k_pages, layer_idx),
                                     _layer_of(v_pages, layer_idx),
                                     page_table, seq_lens, start_lens,
                                     softcap)


def _quantize_token_kv(t):
    """[.., hd] -> (int8 codes, f32 scale over the last axis)."""
    a = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1)
    sc = jnp.where(a > 0, a / 127.0, 1.0)
    codes = jnp.clip(jnp.round(t.astype(jnp.float32) / sc[..., None]),
                     -127, 127).astype(jnp.int8)
    return codes, sc


def _pool_write(pages, new, phys, off, moveaxis_src=0):
    """Write codes(+scales) into array or {"q","s"} pools."""
    if isinstance(pages, dict):
        codes, sc = _quantize_token_kv(new)
        return {"q": pages["q"].at[:, phys, off].set(
                    jnp.moveaxis(codes, moveaxis_src, 1)),
                "s": pages["s"].at[:, phys, off].set(
                    jnp.moveaxis(sc, moveaxis_src, 1))}
    return pages.at[:, phys, off].set(
        jnp.moveaxis(new.astype(pages.dtype), moveaxis_src, 1))


def _page_size_of(pages):
    return (pages["q"] if isinstance(pages, dict) else pages).shape[2]


def _page_size_of_any(pages, layer_idx):
    """Page size of a 4D pool, or of a 5D multi-layer pool when
    ``layer_idx`` is given."""
    a = pages["q"] if isinstance(pages, dict) else pages
    return a.shape[3 if layer_idx is not None else 2]


def _write_kernel(phys_ref, off_ref, li_ref, new_ref, pin_ref, out_ref, *,
                  ps: int):
    """Read-modify-write ONE page block: copy it through and overwrite the
    sublane row ``off`` (Mosaic requires the last two block dims equal the
    array dims or be (8,128)-aligned, so a 1-row block is not lowerable —
    the whole [nkv, 1, ps, hd] page streams through VMEM instead)."""
    i = pl.program_id(0)
    off = off_ref[i]
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, ps, 1), 1) == off
    out_ref[:, 0] = jnp.where(sel, new_ref[0][:, None, :], pin_ref[:, 0])


def _pool_write_pallas_array(pages, new, phys, off, layer_idx=None):
    """IN-PLACE single-token write into a pool [A, nkv, P, ps, hd] (4D
    single-layer pools ride an A=1 view): grid over sequences, each program
    rewrites ONE (nkv, 1, ps, hd) page block at ``(layer_idx, phys[i])``
    with row ``off[i]`` replaced, the pool aliased input->output — pages
    not visited keep their bytes, nothing else is copied. This is what
    makes the paged decode write O(b * page) bytes instead of O(pool): an
    XLA scatter cost 15.1 ms/step and even a chained dynamic_update_slice
    11.9 ms/step at b=8/16 layers/2048 ctx (scripts/bench_paged_gap.py)
    because both materialize fresh pool values per layer; the aliased
    kernel moves ~256 KB/sequence/pool."""
    squeeze = layer_idx is None
    pages, _, li = _as_5d(pages, None, layer_idx)
    b = phys.shape[0]
    _, nkv, _, ps, hd = pages.shape
    blk = pl.BlockSpec((None, nkv, 1, ps, hd),
                       lambda i, phys, off, li: (li[0], 0, phys[i], 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nkv, hd), lambda i, phys, off, li: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            blk,                    # aliased pool, read for the RMW copy
        ],
        out_specs=blk,
    )
    out = pl.pallas_call(
        functools.partial(_write_kernel, ps=ps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        input_output_aliases={4: 0},   # flat arg 4 == pages (after scalars)
    )(phys, off, li, new.astype(pages.dtype), pages)
    return out[0] if squeeze else out


def _pool_write_pallas_q8(pages, new, phys, off, layer_idx=None):
    """int8 pool variant: codes write as the array kernel; the f32 scale
    row [A, nkv, P, ps] rides a [A, nkv, P, 1, ps] view (lane-aligned, same
    trick as the q8 attention kernel's scale blocks) through an RMW kernel
    with the roles of sublane/lane swapped. Both pools aliased in place."""
    codes, sc = _quantize_token_kv(new)          # [b, nkv, hd], [b, nkv]
    squeeze = layer_idx is None
    pages, _, li = _as_5d(pages, None, layer_idx)
    b = phys.shape[0]
    q, s = pages["q"], pages["s"]
    A, nkv, P, ps, _ = q.shape
    # q is already the 5D view here; li selects its (only or real) layer
    q_new = _pool_write_pallas_array(q, codes, phys, off, li)

    def s_kernel(phys_ref, off_ref, li_ref, sc_ref, sin_ref, out_ref):
        i = pl.program_id(0)
        offv = off_ref[i]
        sel = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1) == offv
        out_ref[:, 0, 0] = jnp.where(sel, sc_ref[i][:, None], sin_ref[:, 0, 0])

    s_blk = pl.BlockSpec((None, nkv, 1, 1, ps),
                         lambda i, phys, off, li: (li[0], 0, phys[i], 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            # the WHOLE [b, nkv] scale matrix rides every program (tiny):
            # a (1, nkv) row block would put 1 in the sublane dim, which
            # Mosaic rejects unless it equals the array dim (b) — the
            # kernel indexes its own row via program_id instead
            pl.BlockSpec((b, nkv), lambda i, phys, off, li: (0, 0),
                         memory_space=pltpu.VMEM),
            s_blk,
        ],
        out_specs=s_blk,
    )
    s_new = pl.pallas_call(
        s_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, nkv, P, 1, ps), s.dtype),
        input_output_aliases={4: 0},
    )(phys, off, li, sc.astype(s.dtype), s[:, :, :, None, :])
    out = {"q": q_new, "s": s_new[:, :, :, 0, :]}
    return jax.tree.map(lambda a: a[0], out) if squeeze else out


def paged_pool_write(pages, new, page_table, positions, layer_idx=None):
    """Write one token's vector per sequence into a SINGLE pool
    [nkv, P, ps, hd] — the MLA compressed-latent pool stores ONE pool
    (cat(c, k_rot), nkv=1) instead of a K/V pair (llm/paged_mla.py).

    new: [b, nkv, hd]; positions [b] = logical slot being written
    (== current seq_len). Returns the updated pool (array or int8
    pool pytree). Functional (donation-safe under jit).

    On TPU this is an IN-PLACE pallas kernel with the pool aliased
    input->output (see _pool_write_pallas_array) — O(b) bytes written. Off
    TPU it falls back to an unrolled chain of per-sequence
    dynamic_update_slice ops (not a vector-index scatter: TPU scatter with
    dynamic indices measured 15.1 ms/step and the DUS chain 11.9 ms/step of
    the ~44 ms paged decode step at b=8/16 layers — both materialize fresh
    pool values; scripts/bench_paged_gap.py). Sequences own disjoint pages
    (inactive slots all hit trash page 0, where last-write-wins is fine),
    so write order between sequences is irrelevant."""
    from ssp_x_vit_tpu.ops.dispatch import use_pallas

    b = positions.shape[0]
    ps = _page_size_of_any(pages, layer_idx)
    phys = (page_table[jnp.arange(b), positions // ps]         # [b]
            ).astype(jnp.int32)
    off = (positions % ps).astype(jnp.int32)
    if use_pallas():
        if isinstance(pages, dict):
            return _pool_write_pallas_q8(pages, new, phys, off, layer_idx)
        return _pool_write_pallas_array(pages, new, phys, off, layer_idx)
    if layer_idx is not None:
        # reference path for 5D pools: slice the layer, write, splice back
        lay = paged_pool_write(_layer_of(pages, layer_idx), new, page_table,
                               positions)
        return jax.tree.map(
            lambda full, one: jax.lax.dynamic_update_index_in_dim(
                full, one.astype(full.dtype), layer_idx, 0),
            pages, lay)
    if isinstance(pages, dict):
        codes, sc = _quantize_token_kv(new)                    # [b,nkv,hd],[b,nkv]
        q, s = pages["q"], pages["s"]
        for i in range(b):
            at = (jnp.zeros((), jnp.int32), phys[i], off[i])
            q = jax.lax.dynamic_update_slice(
                q, codes[i][:, None, None, :], at + (jnp.zeros((), jnp.int32),))
            s = jax.lax.dynamic_update_slice(s, sc[i][:, None, None], at)
        return {"q": q, "s": s}
    for i in range(b):
        pages = jax.lax.dynamic_update_slice(
            pages, new[i][:, None, None, :].astype(pages.dtype),
            (jnp.zeros((), jnp.int32), phys[i], off[i],
             jnp.zeros((), jnp.int32)))
    return pages


def paged_pool_write_many(pages, new, page_table, start, valid_len=None,
                          layer_idx=None):
    """Prefill-write s consecutive tokens for ONE sequence into a single
    pool. new: [s, nkv, hd]; page_table: [mp] this sequence's pages;
    start: first logical slot. ``valid_len`` (traced ok) redirects positions
    >= start + valid_len to trash page 0 (static-shape padded prefill).
    ``layer_idx`` selects the layer of a 5D pool (slice + splice-back: the
    prefill write is a once-per-request cost, unlike the decode hot loop)."""
    if layer_idx is not None:
        lay = paged_pool_write_many(_layer_of(pages, layer_idx), new,
                                    page_table, start, valid_len)
        return jax.tree.map(
            lambda full, one: jax.lax.dynamic_update_index_in_dim(
                full, one.astype(full.dtype), layer_idx, 0),
            pages, lay)
    s = new.shape[0]
    ps = _page_size_of(pages)
    pos = start + jnp.arange(s)
    phys = page_table[pos // ps]                               # [s]
    if valid_len is not None:
        phys = jnp.where(pos < start + valid_len, phys, 0)
    return _pool_write(pages, new, phys, pos % ps)


def paged_cache_write(k_pages, v_pages, k_new, v_new, page_table, positions,
                      layer_idx=None):
    """Write one token's K/V per sequence into its page.

    k_new/v_new: [b, nkv, hd]; positions [b] = logical slot being written
    (== current seq_len). Returns updated pools (arrays or int8 pool
    pytrees). Functional (donation-safe under jit). ``layer_idx`` selects
    the layer of 5D multi-layer pools (in-place pallas write on TPU).
    """
    return (paged_pool_write(k_pages, k_new, page_table, positions, layer_idx),
            paged_pool_write(v_pages, v_new, page_table, positions, layer_idx))


def paged_cache_write_many(k_pages, v_pages, k_new, v_new, page_table, start,
                           valid_len=None, layer_idx=None):
    """Write s consecutive tokens (prefill) for ONE sequence.

    k_new/v_new: [s, nkv, hd]; page_table: [mp] this sequence's pages;
    start: first logical slot. ``valid_len`` (traced ok) redirects positions
    >= start + valid_len to trash page 0 (static-shape padded prefill).
    Returns updated pools (arrays or int8 pool pytrees).
    """
    return (paged_pool_write_many(k_pages, k_new, page_table, start,
                                  valid_len, layer_idx),
            paged_pool_write_many(v_pages, v_new, page_table, start,
                                  valid_len, layer_idx))
