"""Paged decode attention: page-gathered KV streaming for serving.

Beyond the reference (its serving story ends at dense contiguous caches):
the production TPU serving stack (vLLM-style continuous batching) stores
KV in fixed-size PAGES owned by a global pool, with a per-sequence page
table — appending a sequence never reallocates or compacts, and mixed
prompt lengths waste at most one page per sequence instead of
``max_len - len`` rows.

TPU-native design:

* pages live as ``[num_pages, Hkv, page_size, Dh]`` so one grid cell's K/V
  block is ``(1, 1, page_size, Dh)`` — the natural (sublane, lane) tile;
* the page walk is the BlockSpec index map: grid ``(B, Hkv, max_pages)``
  where step ``j`` maps the K/V block to ``table[b * max_pages + j]``.
  The table rides in SMEM via scalar prefetch, FLATTENED to 1-D — the
  per-row 1-D lookup is the scalar-prefetch pattern that is stable on v5e
  (2-D prefetch indexing flakes; see docs/env.md);
* steps past a sequence's last page CLAMP the page index to the last valid
  page (Mosaic elides the repeated DMA) and mask their contribution, so
  ragged batches cost bandwidth proportional to ``lens[b]``, not
  ``max(lens)`` — same trick as the causal KV clamp in flash_fwd.py;
* PackGQA row packing (ops/decode.py): the whole GQA group rides one Q
  tile, K/V stream once per KV head;
* fp32 online softmax in VMEM scratch, outputs written once in the
  epilogue (output index constant over the page axis — the safe Mosaic
  revisit pattern).

The dense decode kernel (ops/decode.py) remains the fast path for
contiguous caches; this kernel is the serving-pool variant. Integration
point for models/serving.py: replace ``init_kv_cache`` + shared-row writes
with ``PagedKVCache.alloc`` + ``append_token``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import LANE, cdiv
from .flash_fwd import _pad_dim, use_interpret
from .reference import DEFAULT_MASK_VALUE

_Q_TILE = 16  # minimum bf16 sublane tile (matches ops/decode.py)


@jax.tree_util.register_dataclass
@dataclass
class PagedKVCache:
    """Global page pool + per-sequence page tables.

    ``k_pages``/``v_pages``: [num_pages, Hkv, page_size, Dh]. Page 0 is a
    reserved null page (tables are zero-initialized, so unused table slots
    point at a real — masked — page and the kernel never reads out of
    bounds).
    ``page_table``: [B, max_pages] int32 global page ids.
    ``lens``: [B] int32 tokens currently stored per sequence.
    """

    k_pages: jnp.ndarray
    v_pages: jnp.ndarray
    page_table: jnp.ndarray
    lens: jnp.ndarray
    # int8 pools carry per-ROW fp32 dequant scales [num_pages, Hkv, page]
    # (symmetric amax/127). None = bf16 pools.
    k_scales: Optional[jnp.ndarray] = None
    v_scales: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    @staticmethod
    def alloc(
        batch: int,
        max_len: int,
        n_kv_heads: int,
        head_dim: int,
        page_size: int = 128,
        dtype=jnp.bfloat16,
        extra_pages: int = 0,
        quantized: bool = False,
    ) -> "PagedKVCache":
        """Pool sized for ``batch`` sequences of up to ``max_len`` tokens,
        pages pre-assigned contiguously per sequence (page 0 reserved).

        A real serving scheduler would hand out pages on demand; the
        pre-assignment keeps this structure jit-static while exercising the
        exact same kernel indirection.
        """
        max_pages = cdiv(max_len, page_size)
        num_pages = 1 + batch * max_pages + extra_pages
        shape = (num_pages, n_kv_heads, page_size, head_dim)
        table = (
            1
            + jnp.arange(batch * max_pages, dtype=jnp.int32).reshape(
                batch, max_pages
            )
        )
        if quantized:
            # int8 KV halves the decode kernel's HBM stream — THE lever on
            # a kernel measured at ~91% of bandwidth peak. Per-row
            # symmetric amax scaling costs ~0.4% relative error (the int8
            # values are exact in bf16; dequant folds into [bq, page]-sized
            # VPU multiplies on S and P, never the [page, D] operands).
            pool_dtype, scales = jnp.int8, jnp.zeros(shape[:3], jnp.float32)
        else:
            pool_dtype, scales = dtype, None
        return PagedKVCache(
            k_pages=jnp.zeros(shape, pool_dtype),
            v_pages=jnp.zeros(shape, pool_dtype),
            page_table=table,
            lens=jnp.zeros((batch,), jnp.int32),
            k_scales=scales,
            v_scales=None if scales is None else jnp.array(scales),
        )


def _quantize_rows(x):
    """Symmetric per-row int8: x [..., rows, D] -> (int8 values, fp32
    scales [..., rows]). Zero rows get scale 1 (stored zeros)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scl = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(x.astype(jnp.float32) / scl[..., None])
    return q.astype(jnp.int8), scl.astype(jnp.float32)


def append_token(cache: PagedKVCache, k_new, v_new) -> PagedKVCache:
    """Append one token's K/V per sequence: ``k_new``/``v_new`` are
    [B, Hkv, 1, Dh]. Returns the updated cache (functional).

    A full sequence (``lens[b] == max_pages * page_size``) DROPS the
    append: the write is redirected to the reserved null page and its len
    freezes at capacity. Without this, JAX's clamped gather/DUS would
    silently overwrite the sequence's LAST page (the failure mode
    serve_batch's cache-bound assert exists to prevent); ``lens`` can't be
    asserted under jit, so overflow is made inert instead.
    """
    b = k_new.shape[0]
    page = cache.page_size
    max_pages = cache.page_table.shape[1]
    cap = max_pages * page
    pos = cache.lens  # [B]
    in_range = pos < cap
    page_ids = jax.vmap(
        lambda t, p: t[jnp.clip(p // page, 0, max_pages - 1)]
    )(cache.page_table, pos)
    page_ids = jnp.where(in_range, page_ids, 0)  # null page soaks overflow
    rows = jnp.where(in_range, pos % page, 0)

    def write(pages, new):
        # One dynamic_update_slice per sequence via vmap-of-gather is a
        # scatter; B is small (serving batch), so a fori over B with
        # dynamic_update_slice keeps it a handful of contiguous-row DMAs.
        def body(i, pg):
            upd = new[i].astype(pg.dtype)[:, None, :]  # [Hkv, 1, Dh]
            return lax.dynamic_update_slice(
                pg, upd[None], (page_ids[i], 0, rows[i], 0)
            )

        return lax.fori_loop(0, b, body, pages)

    def write_scales(pool, scl):
        def body(i, pg):
            return lax.dynamic_update_slice(
                pg, scl[i][None, :, None], (page_ids[i], 0, rows[i])
            )

        return lax.fori_loop(0, b, body, pool)

    k_row, v_row = k_new[:, :, 0], v_new[:, :, 0]
    k_scales = v_scales = None
    if cache.quantized:
        k_row, k_scl = _quantize_rows(k_row)  # [B, Hkv, Dh] -> + [B, Hkv]
        v_row, v_scl = _quantize_rows(v_row)
        k_scales = write_scales(cache.k_scales, k_scl)
        v_scales = write_scales(cache.v_scales, v_scl)

    return PagedKVCache(
        k_pages=write(cache.k_pages, k_row),
        v_pages=write(cache.v_pages, v_row),
        page_table=cache.page_table,
        lens=jnp.minimum(cache.lens + 1, cap),
        k_scales=k_scales,
        v_scales=v_scales,
    )


def fill_from_prefill(cache: PagedKVCache, k_dense, v_dense, lens) -> PagedKVCache:
    """Load a prefill's dense K/V ([B, Hkv, Np, Dh], ragged via ``lens``)
    into the pool in one shot.

    One dynamic_update_slice per (sequence, page) — page-table entries may
    be arbitrary pool pages (PageAllocator admission), so the fill walks
    the table rather than assuming ``alloc``'s contiguous slabs. Rows
    beyond ``lens[b]`` are written too (they are masked AND past the table
    walk's clamp, so they are unreachable), keeping each copy one
    contiguous page-sized DMA.
    """
    b, hkv, np_, dh = k_dense.shape
    page = cache.page_size
    max_pages = cache.page_table.shape[1]
    pad = cdiv(np_, page) * page
    n_seq_pages = pad // page
    assert n_seq_pages <= max_pages, (np_, page, max_pages)

    def load(pages, scale_pool, dense):
        # [B, Hkv, pad, Dh] -> [B, n_seq_pages, Hkv, page, Dh]
        d4 = _pad_dim(dense, 2, pad)
        d5 = d4.reshape(b, hkv, n_seq_pages, page, dh).transpose(0, 2, 1, 3, 4)
        s5 = None
        if scale_pool is not None:
            d5, s5 = _quantize_rows(d5)  # scales [B, P, Hkv, page]

        def body(ij, carry):
            pg, scl = carry
            i, j = ij // n_seq_pages, ij % n_seq_pages
            start = cache.page_table[i, j]
            pg = lax.dynamic_update_slice(
                pg, d5[i, j][None].astype(pg.dtype), (start, 0, 0, 0)
            )
            if scl is not None:
                scl = lax.dynamic_update_slice(
                    scl, s5[i, j][None], (start, 0, 0)
                )
            return pg, scl

        return lax.fori_loop(0, b * n_seq_pages, body, (pages, scale_pool))

    k_pages, k_scales = load(cache.k_pages, cache.k_scales, k_dense)
    v_pages, v_scales = load(cache.v_pages, cache.v_scales, v_dense)
    return PagedKVCache(
        k_pages=k_pages,
        v_pages=v_pages,
        page_table=cache.page_table,
        lens=jnp.asarray(lens, jnp.int32),
        k_scales=k_scales,
        v_scales=v_scales,
    )


def fill_slot(cache: PagedKVCache, slot: int, k_dense, v_dense, length) -> PagedKVCache:
    """Load ONE sequence's dense K/V ([Hkv, Np, Dh]) into batch slot
    ``slot``'s pages and set its length — the per-sequence half of
    admission (PageAllocator.acquire + assign_sequence gave the slot its
    pages; this fills them from a fresh prefill). One contiguous
    page-sized DMA per page, like fill_from_prefill."""
    hkv, np_, dh = k_dense.shape
    page = cache.page_size
    max_pages = cache.page_table.shape[1]
    pad = cdiv(max(np_, 1), page) * page
    n_seq_pages = pad // page
    assert n_seq_pages <= max_pages, (np_, page, max_pages)

    def load(pages, scale_pool, dense):
        d4 = _pad_dim(dense, 1, pad)  # [Hkv, pad, Dh]
        d4 = d4.reshape(hkv, n_seq_pages, page, dh).transpose(1, 0, 2, 3)
        s4 = None
        if scale_pool is not None:
            d4, s4 = _quantize_rows(d4)  # scales [P, Hkv, page]

        def body(j, carry):
            pg, scl = carry
            start = cache.page_table[slot, j]
            pg = lax.dynamic_update_slice(
                pg, d4[j][None].astype(pg.dtype), (start, 0, 0, 0)
            )
            if scl is not None:
                scl = lax.dynamic_update_slice(scl, s4[j][None], (start, 0, 0))
            return pg, scl

        return lax.fori_loop(0, n_seq_pages, body, (pages, scale_pool))

    k_pages, k_scales = load(cache.k_pages, cache.k_scales, k_dense)
    v_pages, v_scales = load(cache.v_pages, cache.v_scales, v_dense)
    return PagedKVCache(
        k_pages=k_pages,
        v_pages=v_pages,
        page_table=cache.page_table,
        lens=cache.lens.at[slot].set(jnp.int32(length)),
        k_scales=k_scales,
        v_scales=v_scales,
    )


def _paged_decode_kernel(
    table_ref,  # SMEM [B * max_pages] int32 (scalar prefetch)
    lens_ref,  # SMEM [B] int32 (scalar prefetch)
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, page, D) — bf16, or int8 with ks_ref scales
    v_ref,  # (1, 1, page, Dv)
    ks_ref,  # optional (1, 1, 1, page) fp32 per-row K dequant scales
    vs_ref,  # optional (1, 1, 1, page) fp32 per-row V dequant scales
    o_ref,  # (1, 1, bq, Dv) out
    lse_ref,  # (1, 1, bq, LANE) f32 out
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale,
    max_pages,
    nq,
    softcap=0.0,
    window_left=-1,
):
    b_idx = pl.program_id(0)
    j = pl.program_id(2)
    bq = q_ref.shape[2]
    page = k_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    n_valid = lens_ref[b_idx]
    should_run = j * page < n_valid
    if window_left >= 0:
        # Sliding window over TRUE positions (paged rows ARE positions):
        # the earliest attended position across the tile is
        # lens[b] - nq - W (the t=0 token's window start); pages entirely
        # before it skip compute AND, via the clamped page walk, DMA — a
        # long-cache windowed paged decode streams O(W) bytes.
        should_run = jnp.logical_and(
            should_run, (j + 1) * page > n_valid - nq - window_left
        )

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        if k.dtype == jnp.int8:
            # int8 values are exact in bf16; the per-row dequant folds into
            # the [bq, page]-sized S multiply below (never touching the
            # [page, D] operand).
            k = k.astype(q.dtype)
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        if ks_ref is not None:
            s = s * ks_ref[0, 0]  # [1, page] broadcasts over rows
        if softcap > 0.0:
            # After the dequant multiply: the cap sees the true logit.
            cap = jnp.float32(softcap)
            s = cap * jnp.tanh(s / cap)
        # Ragged tail + speculative causality: all nq new tokens are
        # already appended, so packed row r (query position r % nq, the
        # t-th NEW token) attends cached positions
        # < lens[b] - (nq - 1 - t). nq == 1 reduces to cols < lens[b].
        cols = lax.broadcasted_iota(jnp.int32, (bq, page), 1) + j * page
        qpos = lax.broadcasted_iota(jnp.int32, (bq, page), 0) % nq
        limit = n_valid - (nq - 1) + qpos
        s = jnp.where(cols < limit, s, DEFAULT_MASK_VALUE)
        if window_left >= 0:
            # Token at position limit-1 attends positions >= limit-1-W.
            s = jnp.where(cols >= limit - 1 - window_left, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_tile = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_tile)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, 0:1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]
        if v.dtype == jnp.int8:
            # Fold V's per-row dequant into P (a [bq, page] multiply).
            p = p * vs_ref[0, 0]
            v = v.astype(q_ref.dtype)
        pv = lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + pv

    @pl.when(j == max_pages - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[...] + jnp.log(jnp.maximum(l_scr[...], 1e-38))


def paged_decode_attention(
    q,
    cache: PagedKVCache,
    *,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    softcap: float = 0.0,
    window_left: int = -1,
    sinks: Optional[jnp.ndarray] = None,
):
    """Decode attention over a paged KV cache.

    ``q``: [B, Hq, nq, D] with nq <= 8 (single-token decode or a
    speculative tail; ALL nq tokens' K/V must already be appended, so the
    t-th new token attends positions [0, lens[b] - (nq-1) + t) — standard
    causal decode semantics). GQA inferred from Hq vs the pool's Hkv.
    Returns [B, Hq, nq, Dv].

    Feature kwargs (the gpt-oss/Mistral serving set): ``softcap`` caps the
    true (dequantized) logits; ``window_left`` streams only the last-W
    pages of a long cache (O(W) bytes — fully-out-of-window pages are also
    host-releasable, see ``releasable_lead_pages``); ``sinks`` ([Hq] fp32)
    applies the sink-inclusive softmax via the exact LSE rescale.
    """
    b, hq, nq, d = q.shape
    assert nq <= 8, "paged decode handles tiny-Nq (speculative) tiles only"
    num_pages, hkv, page, dv_dim = cache.k_pages.shape
    group = hq // hkv
    if scale is None:
        scale = d ** -0.5
    max_pages = cache.page_table.shape[1]
    window_left = int(window_left)

    # PackGQA rows (ops/decode.py convention): row r of the tile is q-head
    # hk*group + r // nq at query position r % nq. Padded rows wrap to
    # valid positions; their outputs are sliced away.
    rows = group * nq
    bq = cdiv(max(rows, 1), _Q_TILE) * _Q_TILE
    q_packed = q.reshape(b, hkv, rows, d)
    q_p = _pad_dim(q_packed, 2, bq)

    # Page walk: CLAMP past-the-end steps to the sequence's last valid page
    # (repeat DMAs are elided; contributions masked by lens) so ragged
    # batches stream only what they own. Flattened 1-D table — the stable
    # scalar-prefetch pattern on v5e.
    flat_table = cache.page_table.reshape(-1)

    def page_step(b_, j, lens_ref, pg=page):
        last = jnp.maximum((lens_ref[b_] - 1) // pg, 0)
        jc = jnp.minimum(j, last)
        if window_left >= 0:
            # First page any of the nq tokens can see; out-of-window lead
            # pages repeat it (DMA elided) and skip compute.
            first = jnp.clip(
                (lens_ref[b_] - nq - window_left) // pg, 0, last
            )
            jc = jnp.maximum(jc, first)
        return jc

    def kv_index(b_, hk, j, table_ref, lens_ref, mp=max_pages):
        return (table_ref[b_ * mp + page_step(b_, j, lens_ref)], hk, 0, 0)

    def kv_index4(b_, hk, j, table_ref, lens_ref, mp=max_pages):
        return (table_ref[b_ * mp + page_step(b_, j, lens_ref)], hk, 0, 0)

    in_specs = [
        pl.BlockSpec(
            (1, 1, bq, d),
            lambda b_, hk, j, t_, l_: (b_, hk, 0, 0),
        ),
        pl.BlockSpec((1, 1, page, d), kv_index),
        pl.BlockSpec((1, 1, page, dv_dim), kv_index),
    ]
    inputs = [flat_table, cache.lens, q_p, cache.k_pages, cache.v_pages]
    if cache.quantized:
        # Scales ride with PAGE ON THE LANE AXIS: [num_pages, Hkv, 1, page]
        # blocks of (1, 1, 1, page). The last two block dims are (1, page) —
        # 1 is the full unit axis and page is a LANE multiple — so the block
        # lowers at EVERY page size (the round-4 (1, 1, page, 1) layout put
        # page on sublanes with a unit lane dim, which Mosaic rejected at
        # page=256). This is also the consumption layout: the kernel
        # multiplies the [1, page] scale row straight into s/p along lanes.
        # The unit-axis insert before the minor-most dim is free metadata.
        in_specs += [
            pl.BlockSpec((1, 1, 1, page), kv_index4),
            pl.BlockSpec((1, 1, 1, page), kv_index4),
        ]
        inputs += [cache.k_scales[:, :, None], cache.v_scales[:, :, None]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, max_pages),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, bq, dv_dim), lambda b_, hk, j, t_, l_: (b_, hk, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, bq, LANE), lambda b_, hk, j, t_, l_: (b_, hk, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, dv_dim), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_decode_kernel if cache.quantized else _paged_no_scales(
            _paged_decode_kernel
        ),
        scale=scale,
        max_pages=max_pages,
        nq=nq,
        softcap=float(softcap),
        window_left=window_left,
    )
    o, lse_wide = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, bq, dv_dim), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, bq, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret() if interpret is None else interpret,
    )(*inputs)
    out = o[:, :, :rows].reshape(b, hq, nq, dv_dim)
    if sinks is not None:
        # Sink-inclusive softmax as an exact LSE rescale — zero kernel cost.
        from .attention import apply_sinks

        lse = lse_wide[:, :, :rows, 0].reshape(b, hq, nq)
        out, _ = apply_sinks(out, lse, jnp.asarray(sinks), head_axis=1)
    return out


def releasable_lead_pages(lens, window_left: int, page_size: int, nq: int = 1):
    """Host-side helper: per-sequence count of LEADING pages that a
    sliding-window decode can no longer read (every row is below
    ``lens[b] - nq - window_left``, the earliest position any future token
    attends — lens only grows, so the bound is monotone). A vLLM-style
    engine releases ``seq_pages[:n]`` back to the PageAllocator between
    steps; the table entries can stay (the clamped page walk never visits
    them)."""
    import numpy as np

    lens = np.asarray(lens)
    first_needed = np.maximum(lens - nq - window_left, 0)
    return (first_needed // page_size).astype(np.int32)


def _paged_no_scales(kernel):
    @functools.wraps(kernel)
    def wrapped(t, l, q_ref, k_ref, v_ref, o_ref, lse_ref, m, ll, acc, **kw):
        return kernel(
            t, l, q_ref, k_ref, v_ref, None, None, o_ref, lse_ref, m, ll,
            acc, **kw
        )

    return wrapped


class PageAllocator:
    """Host-side free-list allocator for the serving pool.

    jit programs need static shapes, so page churn happens BETWEEN steps on
    the host: the allocator owns which pool pages are free, and sequence
    slots acquire/release whole page runs through it. The device-side
    PagedKVCache never changes shape — admission rewrites one row of the
    page table (and zeroes the slot's ``lens`` entry), eviction just
    returns the pages.

    This is the piece a vLLM-style engine calls between decode steps:

        alloc = PageAllocator(num_pages=1 + 64, reserved=1)
        pages = alloc.acquire(n_pages)        # admission (None = pool full)
        cache = assign_sequence(cache, slot, pages)   # device update
        ...
        alloc.release(pages)                  # eviction / completion
    """

    def __init__(self, num_pages: int, reserved: int = 1):
        # Page ids [0, reserved) are never handed out (0 = null page).
        self._free = list(range(num_pages - 1, reserved - 1, -1))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def acquire(self, n: int):
        """Pop ``n`` free pages, or None (caller queues the sequence)."""
        if n > len(self._free):
            return None
        got = [self._free.pop() for _ in range(n)]
        return got

    def release(self, pages) -> None:
        seen = set(self._free)
        for p in pages:
            if p in seen:
                raise ValueError(f"double free of page {p}")
            self._free.append(int(p))
            seen.add(p)


def assign_sequence(cache: PagedKVCache, slot: int, pages) -> PagedKVCache:
    """Point batch slot ``slot`` at ``pages`` (from PageAllocator.acquire)
    and reset its length — the device-side half of admission. Unused table
    tail entries point at the null page (never walked: the kernel clamps to
    the last valid page of ``lens``)."""
    max_pages = cache.page_table.shape[1]
    assert len(pages) <= max_pages, (len(pages), max_pages)
    row = jnp.zeros((max_pages,), jnp.int32).at[: len(pages)].set(
        jnp.asarray(pages, jnp.int32)
    )
    return PagedKVCache(
        k_pages=cache.k_pages,
        v_pages=cache.v_pages,
        page_table=cache.page_table.at[slot].set(row),
        lens=cache.lens.at[slot].set(0),
        k_scales=cache.k_scales,
        v_scales=cache.v_scales,
    )
