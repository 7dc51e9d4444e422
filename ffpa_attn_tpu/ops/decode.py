"""Decode (tiny-Nq) attention kernel.

TPU-native re-derivation of the reference split-KV decode path (reference:
triton/_ffpa_fwd.py:498-831 — stage-1 per-KV-chunk partials + stage-2 LSE
merge, selected by a GPU-SM occupancy heuristic at :214-284).

On TPU the design premise changes: a v5e chip has a single TensorCore, so
splitting KV across "SMs" buys nothing — decode throughput is HBM-bandwidth
bound on streaming K/V. The speed-of-light decode kernel is therefore a
*single* pass: grid ``(B, Hkv, Nkv/block_kv)`` with the KV axis innermost
(Mosaic double-buffers the K/V DMA), a packed Q row tile, and fp32
online-softmax accumulators. The reference's stage-2 LSE-merge formula
survives in this codebase where it is actually needed on TPU: the
cross-chip ring-attention combine (parallel/ring.py).

**PackGQA head folding** (reference: cute/utils/pack_gqa.py:15-26): the
whole GQA group is packed into the Q row tile — row ``r`` of the tile is
(query head ``hk*group + r // Nq``, query position ``r % Nq``) — so K/V
stream from HBM ONCE per KV head instead of once per Q head. On a
bandwidth-bound kernel that is a ``group``-fold traffic cut (the dominant
serving shape has group 4-8). Online softmax is per-row and therefore
unchanged by packing.

Backward for decode shapes delegates to the dense split-launch kernels
(padded Q tile) — gradients at Nq<=8 are a training corner case.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import LANE, cdiv
from .flash_fwd import _pad_dim, use_interpret
from .reference import DEFAULT_MASK_VALUE
from .rng import make_row_col_ids

_DECODE_MAX_NQ = 8
_DECODE_Q_TILE = 16  # minimum bf16 sublane tile


def decode_attention_supported(q, k) -> bool:
    return q.shape[2] <= _DECODE_MAX_NQ


def _decode_kernel(
    q_ref,  # (1, 1, 16, D)
    k_ref,  # (1, 1, bkv, D)
    v_ref,  # (1, 1, bkv, Dv)
    bias_ref,  # optional (1, 1, 16|1, bkv)
    o_ref,  # (1, 1, 16, Dv)
    lse_ref,  # (1, 1, 16, LANE) f32, lanes replicated
    s_ref,  # optional (1, 1, 16, bkv) f32 masked-score residual
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale,
    causal,
    causal_offset,
    true_nkv,
    kv_padded,
    num_kv_blocks,
    has_bias,
    nq,
    softcap=0.0,
    window_left=-1,
    window_right=-1,
):
    j = pl.program_id(2)
    bq = q_ref.shape[2]
    bkv = k_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Packed rows carry query positions r % nq <= nq-1; the tile runs when
    # any packed position's band overlaps KV tile j. The sliding-window
    # lower bound is the serving lever: with W << Nkv only ~W/bkv tiles
    # compute (and, via the clamped index map, only those DMA).
    wr_eff = 0 if causal else window_right
    should_run = True
    if causal or window_right >= 0:
        should_run = j * bkv <= nq - 1 + causal_offset + wr_eff
    if window_left >= 0:
        should_run = jnp.logical_and(
            should_run, (j + 1) * bkv - 1 >= causal_offset - window_left
        )

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        if softcap > 0.0:
            cap = jnp.float32(softcap)
            s = cap * jnp.tanh(s / cap)
        if has_bias:
            s = s + jnp.broadcast_to(bias_ref[0, 0].astype(jnp.float32), s.shape)
        rows = lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        qpos = rows % nq  # PackGQA: row r is query position r % nq
        cols = lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
        if causal or window_right >= 0:
            s = jnp.where(
                cols <= qpos + causal_offset + wr_eff, s, DEFAULT_MASK_VALUE
            )
        if window_left >= 0:
            s = jnp.where(
                cols >= qpos + causal_offset - window_left, s,
                DEFAULT_MASK_VALUE,
            )
        if kv_padded:
            s = jnp.where(cols < true_nkv, s, DEFAULT_MASK_VALUE)
        if s_ref is not None:
            # Decode S-residency (the dense from-S backward's analog,
            # flash_bwd.py): the masked post-bias/cap scores are O(16*Nkv)
            # — a ~1 MB write that saves the backward its whole K re-read
            # for the score recompute. Band-skipped steps don't STORE, but
            # Pallas still copies their (stale-VMEM) output block to HBM —
            # the backward's band re-mask keeps that correct, and the emit
            # gate (_decode_core_fwd) disables residency under sliding
            # windows where that copy-back stream would be O(Nkv).
            s_ref[0, 0] = s

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
        pv = lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + pv

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[...] + jnp.log(jnp.maximum(l_scr[...], 1e-38))


def _decode_block_kv(d: int, dv: int, nkv: int, dtype, group: int = 1) -> int:
    """Tuned-store lookup for the decode KV block (direction='decode'),
    falling back to the measured v5e default of 1024."""
    from .dispatch import pick_decode_config

    cfg = pick_decode_config(
        d=d, dv=dv, nkv=nkv, dtype=dtype,
        gqa=group > 1, group=group if group > 1 else 0,
    )
    return cfg.block_kv if cfg is not None else 1024


def _decode_forward(
    q,
    k,
    v,
    bias,
    *,
    scale,
    is_causal,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
    softcap: float = 0.0,
    window: tuple = (-1, -1),
    return_scores: bool = False,
):
    b, hq, nq, d = q.shape
    _, hkv, nkv, _ = k.shape
    dv_dim = v.shape[-1]
    group = hq // hkv
    window_left = int(window[0])
    window_right = -1 if is_causal else int(window[1])

    if block_kv is None:
        block_kv = _decode_block_kv(d, dv_dim, nkv, q.dtype, group=group)

    # PackGQA: rows of the Q tile are (group, nq) pairs — row r is query
    # head hk*group + r//nq at position r % nq. K/V stream once per KV
    # head (reference cute/utils/pack_gqa.py:15-26).
    rows = group * nq
    bq = cdiv(rows, _DECODE_Q_TILE) * _DECODE_Q_TILE
    q_packed = q.reshape(b, hkv, rows, d)
    q_p = _pad_dim(q_packed, 2, bq)
    bkv = min(block_kv, max(LANE, cdiv(nkv, LANE) * LANE))
    nkv_pad = cdiv(nkv, bkv) * bkv
    k_p = _pad_dim(k, 2, nkv_pad)
    v_p = _pad_dim(v, 2, nkv_pad)
    num_kv_blocks = nkv_pad // bkv

    # Tail-aligned causal offset w.r.t. true nq; padded rows wrap to valid
    # query positions (their outputs are sliced away).
    causal_offset = nkv - nq

    # Sliding window: clamp the streamed KV index into the band so the
    # out-of-band prefix (the bulk of a long cache when W << Nkv) never
    # leaves HBM — Pallas elides the repeated-index DMAs.
    wr_eff = 0 if is_causal else window_right
    if window_left >= 0 or (not is_causal and window_right >= 0):

        def kv_index(b_, hk, j):
            jj = j
            if window_left >= 0:
                j_min = jnp.clip(
                    (causal_offset - window_left) // bkv, 0, num_kv_blocks - 1
                )
                jj = jnp.maximum(jj, j_min)
            if is_causal or window_right >= 0:
                j_max = jnp.maximum(
                    (nq - 1 + causal_offset + wr_eff) // bkv, 0
                )
                jj = jnp.minimum(jj, j_max)
            return (b_, hk, jj, 0)

    else:

        def kv_index(b_, hk, j):
            return (b_, hk, j, 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, hk, j: (b_, hk, 0, 0)),
        pl.BlockSpec((1, 1, bkv, d), kv_index),
        pl.BlockSpec((1, 1, bkv, dv_dim), kv_index),
    ]
    inputs = [q_p, k_p, v_p]
    has_bias = bias is not None
    if has_bias:
        if bias.shape[1] != 1 or (bias.shape[2] != 1 and group > 1):
            # Head- or row-varying bias must be packed like Q.
            bias = jnp.broadcast_to(
                bias, (bias.shape[0], hq, nq, bias.shape[3])
            ).reshape(bias.shape[0], hkv, rows, bias.shape[3])
        bias_block = [1, 1, 1, 1]
        if bias.shape[2] != 1:
            bias = _pad_dim(bias, 2, bq)
            bias_block[2] = bq
        bias = _pad_dim(bias, 3, nkv_pad)
        bias_block[3] = bkv

        def bias_index(b_, hk, j, shape=bias.shape):
            return (
                b_ if shape[0] != 1 else 0,
                hk if shape[1] != 1 else 0,
                0,
                j,
            )

        in_specs.append(pl.BlockSpec(tuple(bias_block), bias_index))
        inputs.append(bias)

    kernel = _decode_adapt(_decode_kernel, has_bias, return_scores)
    kernel = functools.partial(
        kernel,
        scale=scale,
        causal=is_causal,
        causal_offset=causal_offset,
        true_nkv=nkv,
        kv_padded=nkv_pad != nkv,
        num_kv_blocks=num_kv_blocks,
        has_bias=has_bias,
        nq=nq,
        softcap=float(softcap),
        window_left=window_left,
        window_right=window_right,
    )

    out_specs = [
        pl.BlockSpec((1, 1, bq, dv_dim), lambda b_, hk, j: (b_, hk, 0, 0)),
        pl.BlockSpec((1, 1, bq, LANE), lambda b_, hk, j: (b_, hk, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, hkv, bq, dv_dim), q.dtype),
        jax.ShapeDtypeStruct((b, hkv, bq, LANE), jnp.float32),
    ]
    if return_scores:
        # NOT clamped like kv_index: each tile writes its own columns.
        out_specs.append(
            pl.BlockSpec((1, 1, bq, bkv), lambda b_, hk, j: (b_, hk, 0, j))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, hkv, bq, nkv_pad), jnp.float32)
        )

    outs = pl.pallas_call(
        kernel,
        grid=(b, hkv, num_kv_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, dv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret() if interpret is None else interpret,
    )(*inputs)
    o, lse_wide = outs[0], outs[1]

    o = o[:, :, :rows].reshape(b, hq, nq, dv_dim)
    lse = lse_wide[:, :, :rows, 0].reshape(b, hq, nq)
    if return_scores:
        return o, lse, outs[2]
    return o, lse


def _decode_adapt(kernel, has_bias: bool, has_scores: bool):
    """Map pallas positional refs onto the full kernel signature, filling
    the absent optional refs (bias in, scores out) with None."""

    @functools.wraps(kernel)
    def wrapped(*refs, **kw):
        refs = list(refs)
        m, l, acc = refs[-3:]
        refs = refs[:-3]
        q_ref, k_ref, v_ref = refs[:3]
        refs = refs[3:]
        bias_ref = refs.pop(0) if has_bias else None
        o_ref, lse_ref = refs[:2]
        s_ref = refs[2] if has_scores else None
        return kernel(
            q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, s_ref, m, l, acc,
            **kw,
        )

    return wrapped


def _decode_apply_sinks(o, lse, sinks):
    from .attention import apply_sinks

    return apply_sinks(o, lse, sinks, head_axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _decode_core(scale, is_causal, softcap, window, q, k, v, bias, sinks):
    o, lse = _decode_forward(
        q, k, v, bias, scale=scale, is_causal=is_causal,
        softcap=softcap, window=window,
    )
    if sinks is not None:
        o, _ = _decode_apply_sinks(o, lse, sinks)
    return o


# Score-residual budget for the differentiated decode forward: below this
# the kernel emits the masked scores (a ~1 MB-per-head-row write) and the
# backward skips its whole K re-read; above it the backward recomputes S
# from (q, k, lse). 256 MiB keeps the residual invisible at serving/bench
# shapes without risking HBM on huge-cache corners.
_DECODE_SCORES_MAX_BYTES = 256 * 1024 * 1024


def _decode_core_fwd(scale, is_causal, softcap, window, q, k, v, bias, sinks):
    from ..env import ENV

    b, hq, nq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    bq = cdiv(group * nq, _DECODE_Q_TILE) * _DECODE_Q_TILE
    # Budget is per ATTENTION CALL; an L-layer model under jax.grad keeps
    # every layer's residual live from forward to backward, so scale by the
    # same assumed-layers multiplier the dense S-residency gate uses.
    budget = _DECODE_SCORES_MAX_BYTES // max(
        1, ENV.scores_auto_assumed_layers()
    )
    emit_scores = (
        b * hkv * bq * k.shape[2] * 4 <= budget
        # The from-S tanh chain factor is recoverable only when the saved
        # S carries no additive terms (same rule as the dense S-residency
        # gate, ops/attention.py:_resident_head_count).
        and not (softcap > 0.0 and bias is not None)
        # Sliding windows: the kernel's kv-index clamp makes compute O(W),
        # but a scores OUTPUT block is copied back to HBM for every grid
        # step whether written or not — an O(Nkv_pad) stream that defeats
        # the windowed-decode point. Recompute-from-(q,k,lse) instead.
        and int(window[0]) < 0
        and int(window[1]) < 0
    )
    scores = None
    if emit_scores:
        o, lse, scores = _decode_forward(
            q, k, v, bias, scale=scale, is_causal=is_causal,
            softcap=softcap, window=window, return_scores=True,
        )
    else:
        o, lse = _decode_forward(
            q, k, v, bias, scale=scale, is_causal=is_causal,
            softcap=softcap, window=window,
        )
    if sinks is not None:
        # Sink-inclusive residuals: the backward is exact under them
        # (ops/attention.py:apply_sinks) — with p = exp(s - lse'), the
        # standard ds identity already accounts for the sink's normalizer
        # share, and dsinks falls out in closed form (sink_grad).
        o, lse = _decode_apply_sinks(o, lse, sinks)
    return o, (q, k, v, bias, sinks, o, lse, scores)


# Above this many score elements (B*Hq*Nq*Nkv) the composite's fp32
# [B,Hkv,G,Nq,Nkv] score/dS buffers stop being "trivially fused" and can
# out-size HBM (e.g. B=32, Hq=32, Nkv=128K caches); route to the tiled
# flash backward, which streams O(block) memory.
_DECODE_BWD_COMPOSITE_MAX_ELEMS = 1 << 28  # 256M f32 elems = 1 GiB/buffer


def _decode_core_bwd(scale, is_causal, softcap, window, residuals, do):
    """Grouped fp32 composite vjp for decode (Nq <= 8) shapes.

    NOT the dense Pallas backward: at Nq <= 8 the score tensor is
    O(group*8 x Nkv) — trivially fused by XLA — while the tiled backward
    pads the Q axis to a full 128-row block and streams whole K/V tiles
    for it (measured round 4: 4.33 ms vs the composite's 1.63 ms at
    Nkv=8192 D=512 MHA).

    The GQA-critical property (round-4 regression fix): everything stays
    in GROUPED [B, Hkv, G*Nq, *] layout — K/V are never expanded to Hq
    width, dS is contracted over the whole (group, Nq) row axis in ONE
    matmul per KV head, so the K/V HBM stream is Hkv-wide bf16 (the same
    einsum restructuring the Pallas backward does in its accumulator).
    The expand-heads jax.vjp this replaces materialized fp32 [B,Hq,Nkv,D]
    K/V copies — a group*2x traffic blowup that benched 0.35x vs SDPA.
    bf16 x bf16 -> fp32-accumulated dots are exact for bf16 operands, so
    this remains the oracle's own gradient.
    """
    from .attention import sink_grad
    from .flash_bwd import flash_attention_backward

    q, k, v, bias, sinks, o, lse, scores = residuals
    b, hq, nq, d = q.shape
    hkv, nkv = k.shape[1], k.shape[2]
    dv_dim = v.shape[-1]
    g = hq // hkv

    if b * hq * nq * nkv > _DECODE_BWD_COMPOSITE_MAX_ELEMS:
        # Huge-cache training corner: tiled backward, O(block) memory.
        dq, dk, dv, dbias = flash_attention_backward(
            q, k, v, bias, o, lse, do.astype(o.dtype),
            scale=scale, is_causal=is_causal,
            softcap=softcap, window=window,
        )
        dsinks = None if sinks is None else sink_grad(do, o, lse, sinks)
        return (
            dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias, dsinks,
        )

    rows, cols = make_row_col_ids(nq, nkv)
    offset = nkv - nq
    qg = q.reshape(b, hkv, g, nq, d)
    dog = do.astype(o.dtype).reshape(b, hkv, g, nq, dv_dim)
    lse_g = lse.reshape(b, hkv, g, nq)

    wl, wr = int(window[0]), int(window[1])
    if is_causal:
        wr = 0
    band = None
    if wr >= 0 or wl >= 0:
        band = jnp.ones((nq, nkv), bool)
        if wr >= 0:
            band = band & (cols <= rows + offset + wr)
        if wl >= 0:
            band = band & (cols >= rows + offset - wl)

    t = None
    if scores is not None:
        # From-S: the forward saved the masked post-bias/cap scores, so the
        # backward never re-reads K for the score recompute. Skipped tiles
        # (band-gated forward steps) left garbage columns — the band
        # re-mask zeroes them.
        s = scores[:, :, : g * nq, :nkv].reshape(b, hkv, g, nq, nkv)
        if band is not None:
            s = jnp.where(band[None, None, None], s, DEFAULT_MASK_VALUE)
        if softcap and softcap > 0.0:
            # s = cap*tanh(s_pre/cap) (no additive terms by the emit gate),
            # so the chain factor's tanh is s/cap. Clamp: masked sentinel
            # values would overflow t*t into inf and 0*inf = NaN.
            t = jnp.clip(s / jnp.float32(softcap), -1.0, 1.0)
    else:
        # Recompute P from the saved LSE (fp32-accum, grouped K stream).
        s = lax.dot_general(
            qg, k,
            ((((4,), (3,))), (((0, 1), (0, 1)))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)  # [B, Hkv, G, Nq, Nkv]
        if softcap and softcap > 0.0:
            cap = jnp.float32(softcap)
            t = jnp.tanh(s / cap)
            s = cap * t
        if bias is not None:
            bias_f = jnp.broadcast_to(
                bias.astype(jnp.float32), (b, hq, nq, nkv)
            ).reshape(b, hkv, g, nq, nkv) if (
                bias.shape[1] != 1 or g == 1
            ) else bias.astype(jnp.float32)[:, :, None]
            s = s + bias_f
        if band is not None:
            s = jnp.where(band[None, None, None], s, DEFAULT_MASK_VALUE)
    # Out-of-band p underflows to exactly 0 (MASK_VALUE - lse << -88), so
    # masked keys get exactly-zero dk/dv, matching the oracle's vjp.
    p = jnp.exp(s - lse_g[..., None])

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(b, hkv, g, nq)
    dp = lax.dot_general(
        dog, v,
        ((((4,), (3,))), (((0, 1), (0, 1)))),
        preferred_element_type=jnp.float32,
    )  # [B, Hkv, G, Nq, Nkv]
    ds = p * (dp - delta[..., None])

    dbias = None
    if bias is not None:
        # sum-to-size over the broadcast axes of the original bias shape.
        ds_full = ds.reshape(b, hq, nq, nkv)
        reduce_axes = tuple(
            ax for ax in range(4) if bias.shape[ax] == 1 and ds_full.shape[ax] != 1
        )
        dbias = ds_full.sum(axis=reduce_axes, keepdims=True).astype(bias.dtype)

    if t is not None:
        ds = ds * (1.0 - t * t)
    ds = ds * jnp.float32(scale)

    dq = lax.dot_general(
        ds, k,
        ((((4,), (2,))), (((0, 1), (0, 1)))),
        preferred_element_type=jnp.float32,
    ).reshape(b, hq, nq, d)  # [B,Hkv,G,Nq,D]
    # dk/dv contract over the whole packed (G, Nq) row axis in one matmul
    # per KV head — the grouped-accumulator sum.
    dk = lax.dot_general(
        ds, qg,
        ((((2, 3), (2, 3))), (((0, 1), (0, 1)))),
        preferred_element_type=jnp.float32,
    )  # contracts (G, Nq) -> [B, Hkv, Nkv, D]
    dv = lax.dot_general(
        p, dog,
        ((((2, 3), (2, 3))), (((0, 1), (0, 1)))),
        preferred_element_type=jnp.float32,
    )  # [B, Hkv, Nkv, Dv]

    dsinks = None if sinks is None else sink_grad(do, o, lse, sinks)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        dbias, dsinks,
    )


_decode_core.defvjp(_decode_core_fwd, _decode_core_bwd)


def decode_attention(
    q, k, v, bias, *, scale, is_causal, softcap=0.0, window=(-1, -1),
    sinks=None,
):
    return _decode_core(
        scale, is_causal, float(softcap), tuple(window), q, k, v, bias, sinks
    )
