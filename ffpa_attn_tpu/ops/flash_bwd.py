"""Pallas TPU backward kernels for FFPA exact attention.

TPU-first re-design of the reference backward family. The reference's
shared-pid single-kernel scheme is documented (by the reference itself) as
its main perf flaw (reference: triton/_ffpa_bwd.py:34-69), and its best
generation is the split-launch / SM90 design: a *preprocess* pass, a
*dK/dV* kernel where each cell owns a KV tile and streams Q tiles, and a
*dQ* kernel where each cell owns a Q tile and streams KV tiles (reference:
cute/_dkdv_d512_sm90.py, cute/_dq_d512_sm90.py, SURVEY.md §7 step 3). We
adopt exactly that three-launch structure:

1. preprocess: ``delta = rowsum(dO * O)`` — left to XLA (a perfectly fused
   elementwise+reduce; no kernel needed on TPU).
2. dK/dV kernel: grid ``(B, Hq, Nkv/block_kv, Nq/block_q)``; fp32 dK/dV
   accumulators live in VMEM scratch with ONE store per tile (no
   load-add-store round trips, no atomics — the flaw the reference calls
   out at triton/_ffpa_bwd.py:34-69).
3. dQ kernel: grid ``(B, Hq, Nq/block_q, Nkv/block_kv)``; fp32 dQ
   accumulator in VMEM scratch; optionally also emits the additive-bias
   gradient dS tiles (reference supports attn-mask gradients,
   triton/_ffpa_bwd.py:117-177).

Softmax is reconstructed from the saved natural-log LSE:
``p = exp(s - lse)`` (already normalized), so no separate (m, l) residuals
are needed. Dropout is replayed bit-identically from the layout-independent
hash (``rng.py``) — the analog of Philox replay
(triton/_ffpa_bwd.py:196-221). GQA backward folds the head group into the
dK/dV kernel's streamed axis, so group reduction happens in the fp32 VMEM
accumulator — one store per KV-head tile, no expand/reduce HBM round trip
(improves on the reference's scheme, triton/_ffpa_bwd.py:2936-2990).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import LANE, BlockConfig, cdiv
from .flash_fwd import _pad_dim, use_interpret
from .reference import DEFAULT_MASK_VALUE
from .rng import dropout_keep_mask


def _dv_accumulate(dv_scr, p_dropped, do, precise_pv: bool, do_lo=None):
    """dV += P_drop^T @ dO. ``precise_pv`` splits P — and, when ``do_lo``
    carries the f16 cotangent's low bf16 part, dO — into hi+lo bf16 pairs
    (two extra MXU matmuls, dropping the lo*lo term): the float16 numerics
    contract (1e-2, reference tests/test_ffpa_bwd.py:43-46) needs finer
    rounding than bf16's 8 mantissa bits on BOTH operands (measured: P-split
    alone leaves a ~7e-5 violation tail at N=2048; with the dO split the
    error drops to ~1e-5, beating even the reference's native-fp16 path)."""
    if precise_pv:
        # FFPA_TPU_F16_PV_MODE is resolved ONCE at the entry point
        # (flash_attention_backward): 'plain' arrives as precise_pv=False,
        # 'psplit' as do_lo=None, 'hilo' as do_lo set — no second ENV read
        # here, so the scheme cannot diverge between decision sites.
        p_hi = p_dropped.astype(do.dtype)
        p_lo = (p_dropped - p_hi.astype(jnp.float32)).astype(do.dtype)
        acc = lax.dot_general(
            p_hi, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if do_lo is not None:
            acc += lax.dot_general(
                p_hi, do_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dv_scr[...] += acc
    else:
        dv_scr[...] += lax.dot_general(
            p_dropped.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _recompute_ds(
    q,
    k,
    v,
    do,
    lse_row,  # (bq, 1) f32
    delta_row,  # (bq, 1) f32
    *,
    scale,
    causal,
    causal_offset,
    true_nkv,
    kv_padded,
    true_nq,
    q_padded,
    dropout_p,
    seed,
    b_idx,
    h_idx,
    row_start,
    col_start,
    bias=None,
    col_offset=0,
    row_offset=0,
    softcap=0.0,
    window_left=-1,
    window_right=-1,
    alibi_slope=None,
):
    """Shared tile math: returns (p_dropped, ds, ds_qk), all (bq, bkv) fp32.

    ``p_dropped`` is the dropout-applied normalized probability used for dV;
    ``ds`` is the post-bias score gradient (== the bias gradient);
    ``ds_qk`` is the gradient w.r.t. the raw scaled logits — identical to
    ``ds`` unless softcap is active, in which case it carries the
    ``1 - tanh^2`` chain factor and is what the dK/dQ matmuls must consume.
    ``col_offset``/``row_offset`` map local tile coordinates back to GLOBAL
    sequence positions for the dropout hash when the launch covers a
    KV-stripe / Q-row slice of the full problem.
    """
    bq = q.shape[0]
    bkv = k.shape[0]
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * jnp.float32(scale)
    cap_factor = None
    if softcap > 0.0:
        cap = jnp.float32(softcap)
        s = cap * jnp.tanh(s / cap)
        # d(cap*tanh(u/cap))/du = 1 - (s/cap)^2, from the capped value
        # itself — no extra transcendental.
        cap_factor = 1.0 - jnp.square(s / cap)

    rows = lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + row_start
    cols = lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + col_start
    if alibi_slope is not None:
        dist = jnp.abs(rows + causal_offset - cols).astype(jnp.float32)
        s = s - alibi_slope * dist
    if bias is not None:
        s = s + jnp.broadcast_to(bias.astype(jnp.float32), s.shape)

    wr_eff = 0 if causal else window_right
    if causal or window_right >= 0:
        s = jnp.where(cols <= rows + causal_offset + wr_eff, s, DEFAULT_MASK_VALUE)
    if window_left >= 0:
        s = jnp.where(
            cols >= rows + causal_offset - window_left, s, DEFAULT_MASK_VALUE
        )
    if kv_padded:
        s = jnp.where(cols < true_nkv, s, DEFAULT_MASK_VALUE)

    p = jnp.exp(s - lse_row)  # normalized probabilities (bq, bkv)
    if q_padded:
        # Padded Q rows have garbage lse; zero their contribution.
        p = jnp.where(rows < true_nq, p, 0.0)

    # dP = dO @ V^T
    dp = lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    if dropout_p > 0.0:
        # col_offset: KV-striped launches index a slice of the global KV
        # axis; the dropout hash must see GLOBAL column ids to replay the
        # forward mask bit-identically. (bq,1)x(1,bkv) grids keep all but
        # the final hash combine off the full tile.
        keep = dropout_keep_mask(
            seed, b_idx, h_idx, rows[:, :1] + row_offset,
            cols[:1, :] + col_offset,
            dropout_p,
        )
        inv = jnp.float32(1.0 / (1.0 - dropout_p))
        p_dropped = jnp.where(keep, p, 0.0) * inv
        dp_eff = jnp.where(keep, dp, 0.0) * inv
    else:
        p_dropped = p
        dp_eff = dp

    ds = p * (dp_eff - delta_row)
    ds_qk = ds if cap_factor is None else ds * cap_factor
    return p_dropped, ds, ds_qk


# ---------------------------------------------------------------------------
# dK/dV kernel: cell owns a KV tile, streams Q tiles.
# ---------------------------------------------------------------------------


def _dkdv_kernel(
    seed_ref,
    alibi_ref,  # optional SMEM (B, Hq) f32
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, bkv, D)
    v_ref,  # (1, 1, bkv, Dv)
    do_ref,  # (1, 1, bq, Dv)
    do_lo_ref,  # optional (1, 1, bq, Dv) — f16 cotangent low bf16 part
    lse_ref,  # (1, 1, 1, bq) — [B, H, 1, Nq] layout
    delta_ref,  # (1, 1, bq)
    bias_ref,  # optional
    dk_ref,  # (1, 1, bkv, D) out
    dv_ref,  # (1, 1, bkv, Dv) out
    ds_ref,  # optional (1, 1, bq, bkv) out — bf16 dS handoff
    dk_scr,  # VMEM (bkv, D) f32
    dv_scr,  # VMEM (bkv, Dv) f32
    *,
    scale,
    causal,
    causal_offset,
    true_nkv,
    kv_padded,
    true_nq,
    q_padded,
    dropout_p,
    num_q_blocks,
    has_bias,
    emit_ds,
    col_offset=0,
    row_offset=0,
    group=1,
    precise_pv=False,
    softcap=0.0,
    window_left=-1,
    window_right=-1,
    has_alibi=False,
):
    # Grid: (B, Hkv, kv-tiles, group*q-tiles) — the GQA group streams
    # through the SAME kv owner cell, so dK/dV accumulate across the whole
    # group in VMEM and come out already group-reduced [B, Hkv, Nkv, D]
    # (replaces the reference's expand/reduce HBM round trip,
    # triton/_ffpa_bwd.py:2936-2990).
    b_idx = pl.program_id(0)
    hk_idx = pl.program_id(1)
    j = pl.program_id(2)  # kv tile owner
    gi = pl.program_id(3)  # g * num_q_blocks + i
    g = gi // num_q_blocks
    i = gi % num_q_blocks
    h_idx = hk_idx * group + g  # q-head id (dropout hash, bias rows)

    bq = q_ref.shape[2]
    bkv = k_ref.shape[2]

    @pl.when(gi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    wr_eff = 0 if causal else window_right
    should_run = True
    if causal or window_right >= 0:
        should_run = j * bkv <= (i + 1) * bq - 1 + causal_offset + wr_eff
    if window_left >= 0:
        should_run = jnp.logical_and(
            should_run,
            (j + 1) * bkv - 1 >= i * bq + causal_offset - window_left,
        )

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0, 0][:, None]
        delta_row = delta_ref[0, 0, 0][:, None]
        bias = bias_ref[0, 0] if has_bias else None

        p_dropped, _, ds_qk = _recompute_ds(
            q,
            k,
            v,
            do,
            lse_row,
            delta_row,
            scale=scale,
            causal=causal,
            causal_offset=causal_offset,
            true_nkv=true_nkv,
            kv_padded=kv_padded,
            true_nq=true_nq,
            q_padded=q_padded,
            dropout_p=dropout_p,
            seed=seed_ref[0, 0],
            b_idx=b_idx,
            h_idx=h_idx,
            row_start=i * bq,
            col_start=j * bkv,
            bias=bias,
            col_offset=col_offset,
            row_offset=row_offset,
            softcap=softcap,
            window_left=window_left,
            window_right=window_right,
            alibi_slope=alibi_ref[b_idx, h_idx] if has_alibi else None,
        )

        # dV += P_drop^T @ dO   — (bkv, bq) @ (bq, Dv)
        do_lo = do_lo_ref[0, 0] if do_lo_ref is not None else None
        _dv_accumulate(dv_scr, p_dropped, do, precise_pv, do_lo=do_lo)
        # dK += scale * dS^T @ Q   (ds_qk carries the softcap chain factor;
        # identical to the bias gradient dS when softcap is off)
        dk_scr[...] += jnp.float32(scale) * lax.dot_general(
            ds_qk.astype(q.dtype),
            q,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if emit_ds:
            # Handoff: the dQ pass becomes a pure XLA matmul over dS.
            # Same bf16 rounding the dQ kernel applies before its dS @ K.
            # With softcap the slab holds ds_qk — exactly what dQ = dS @ K
            # needs; dbias-from-slab callers are gated off when softcap is
            # active with a bias (flash_attention_backward).
            ds_ref[0, 0] = ds_qk.astype(ds_ref.dtype)

    if emit_ds and causal:
        # Skipped above-diagonal tiles must still define their dS block.
        # (A clamped out map that skips these writes NaNs on real hardware:
        # Mosaic output revisiting is only safe when the revisited block is
        # written on the FIRST step of its run — here the skipped steps
        # precede the live one. Caught by the on-TPU verify lane.)
        @pl.when(jnp.logical_not(should_run))
        def _zero_ds():
            ds_ref[0, 0] = jnp.zeros_like(ds_ref[0, 0])

    @pl.when(gi == group * num_q_blocks - 1)
    def _epilogue():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# S-resident dK/dV kernel: consumes the forward's S residual — no S
# recompute, no K input. Together with the dS-handoff dQ einsum this is a
# 4-matmul backward (dP, dV, dK here + dS@K), matching the matmul count of
# XLA's P-saving composite SDPA while keeping flash-style numerics.
# ---------------------------------------------------------------------------


def _dkdv_from_s_kernel(
    seed_ref,
    s_ref,  # (1, 1, bq, bkv) — saved post-scale/bias/mask scores
    q_ref,  # (1, 1, bq, D) — None when dk_in_kernel=False (q unread)
    v_ref,  # (1, 1, bkv, Dv)
    do_ref,  # (1, 1, bq, Dv)
    lse_ref,  # (1, 1, 1, bq)
    delta_ref,  # (1, 1, 1, bq)
    dk_ref,  # (1, 1, bkv, D) out — None when dk_in_kernel=False
    dv_ref,  # (1, 1, bkv, Dv) out
    ds_ref,  # (1, 1, bq, bkv) out — bf16 dS handoff (HBM-aliased over S)
    dk_scr,  # VMEM (bkv, D) f32 — None when dk_in_kernel=False
    dv_scr,  # VMEM (bkv, Dv) f32
    *,
    scale,
    causal,
    causal_offset,
    true_nq,
    q_padded,
    dropout_p,
    num_q_blocks,
    group=1,
    precise_pv=False,
    dk_in_kernel=True,
    softcap=0.0,
):
    b_idx = pl.program_id(0)
    hk_idx = pl.program_id(1)
    j = pl.program_id(2)  # kv tile owner
    gi = pl.program_id(3)  # g * num_q_blocks + i
    g = gi // num_q_blocks
    i = gi % num_q_blocks
    h_idx = hk_idx * group + g

    bq = s_ref.shape[2]
    bkv = s_ref.shape[3]

    @pl.when(gi == 0)
    def _init():
        if dk_in_kernel:
            dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if causal:
        should_run = j * bkv <= (i + 1) * bq - 1 + causal_offset
    else:
        should_run = True

    @pl.when(should_run)
    def _compute():
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0, 0][:, None]
        delta_row = delta_ref[0, 0, 0][:, None]
        s = s_ref[0, 0].astype(jnp.float32)

        # Saved S already carries scale/bias/causal/kv-pad masking (masked
        # entries hold DEFAULT_MASK_VALUE -> p == 0).
        p = jnp.exp(s - lse_row)
        rows = lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
        if q_padded:
            p = jnp.where(rows < true_nq, p, 0.0)

        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        if dropout_p > 0.0:
            cols = lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
            keep = dropout_keep_mask(
                seed_ref[0, 0], b_idx, h_idx, rows[:, :1], cols[:1, :],
                dropout_p,
            )
            inv = jnp.float32(1.0 / (1.0 - dropout_p))
            p_dropped = jnp.where(keep, p, 0.0) * inv
            dp_eff = jnp.where(keep, dp, 0.0) * inv
        else:
            p_dropped = p
            dp_eff = dp

        ds = p * (dp_eff - delta_row)
        if softcap > 0.0:
            # The saved S is the post-cap value (callers gate S-residency
            # off when softcap combines with bias/alibi, so s here is
            # exactly cap*tanh(raw/cap)); recover the chain factor from it.
            # Masked entries: (DMV/cap)^2 -> inf, 1-inf -> -inf, max -> 0.
            cap = jnp.float32(softcap)
            ds = ds * jnp.maximum(1.0 - jnp.square(s / cap), 0.0)

        _dv_accumulate(dv_scr, p_dropped, do, precise_pv)
        if dk_in_kernel:
            q = q_ref[0, 0]
            dk_scr[...] += jnp.float32(scale) * lax.dot_general(
                ds.astype(q.dtype),
                q,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ds_ref[0, 0] = ds.astype(ds_ref.dtype)

    if causal:
        # Skipped tiles always write zero dS here. A clamped out map (as in
        # the non-aliased handoff kernel) is UNSAFE with the S->dS aliasing:
        # mapping skipped steps onto the diagonal slot makes their write-back
        # race the prefetch of the S tile still to be read there (caught as
        # NaN dq on real hardware; interpret mode serializes and hides it).
        @pl.when(jnp.logical_not(should_run))
        def _zero_ds():
            ds_ref[0, 0] = jnp.zeros_like(ds_ref[0, 0])

    @pl.when(gi == group * num_q_blocks - 1)
    def _epilogue():
        if dk_in_kernel:
            dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _adapt_from_s(kernel, dk_in_kernel: bool):
    """Map the actual pallas ref list to the full _dkdv_from_s_kernel
    signature (q/dk refs and dk scratch are absent when dK is produced by
    the XLA einsum over the dS slab instead of in-kernel)."""
    if dk_in_kernel:
        return kernel

    @functools.wraps(kernel)
    def wrapped(seed_ref, s_ref, v_ref, do_ref, lse_ref, delta_ref,
                dv_ref, ds_ref, dv_scr, **kw):
        return kernel(
            seed_ref, s_ref, None, v_ref, do_ref, lse_ref, delta_ref,
            None, dv_ref, ds_ref, None, dv_scr, **kw
        )

    return wrapped


def _dkdv_from_s_launch(
    q, v, s_pad, do, lse, delta, seed_arr, config,
    *, scale, is_causal, causal_offset, dropout_p, group,
    grad_kv_storage_dtype, interpret, precise_pv=False, softcap=0.0,
):
    """Launch the S-resident dK/dV kernel. ``s_pad`` is the forward's padded
    [B, Hq, nq_pad, nkv_pad] residual; its padding dictates the block grid,
    so the config's dkdv blocks must divide it (``_fit_blocks_to_scores``).
    Returns (dk, dv, ds_full) with ds_full aliased over s_pad's HBM."""
    b, hq, nq, d = q.shape
    hkv = v.shape[1]
    nkv = v.shape[2]
    dv_dim = v.shape[-1]
    bq, bkv = config.block_q_dkdv, config.block_kv_dkdv
    nq_pad, nkv_pad = s_pad.shape[2], s_pad.shape[3]
    q_p = _pad_dim(q, 2, nq_pad)
    do_p = _pad_dim(do, 2, nq_pad)
    lse_p = _pad_dim(lse, 2, nq_pad)
    delta_p = _pad_dim(delta, 2, nq_pad)
    v_p = _pad_dim(v, 2, nkv_pad)

    num_q_blocks = nq_pad // bq
    num_kv_blocks = nkv_pad // bkv
    nqb = num_q_blocks

    if is_causal:

        def qi_index(j, i, bq=bq, bkv=bkv, off=causal_offset):
            i_min = jnp.maximum(0, -(-(j * bkv + 1 - off) // bq) - 1)
            return jnp.maximum(i, i_min)

    else:

        def qi_index(j, i):
            return i

    def qh(hk, gi, g=group):
        return hk * g + gi // nqb

    def qi(j, gi):
        return qi_index(j, gi % nqb)

    dk_in_kernel = bool(getattr(config, "dkdv_dk_in_kernel", True))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, 1, bq, bkv), lambda b_, hk, j, gi: (b_, qh(hk, gi), qi(j, gi), j)
        ),
    ]
    inputs = [seed_arr, s_pad]
    if dk_in_kernel:
        in_specs.append(pl.BlockSpec(
            (1, 1, bq, d), lambda b_, hk, j, gi: (b_, qh(hk, gi), qi(j, gi), 0)
        ))
        inputs.append(q_p)
    in_specs += [
        pl.BlockSpec((1, 1, bkv, dv_dim), lambda b_, hk, j, gi: (b_, hk, j, 0)),
        pl.BlockSpec(
            (1, 1, bq, dv_dim),
            lambda b_, hk, j, gi: (b_, qh(hk, gi), qi(j, gi), 0),
        ),
        pl.BlockSpec(
            (1, 1, 1, bq), lambda b_, hk, j, gi: (b_, qh(hk, gi), 0, qi(j, gi))
        ),
        pl.BlockSpec(
            (1, 1, 1, bq), lambda b_, hk, j, gi: (b_, qh(hk, gi), 0, qi(j, gi))
        ),
    ]
    inputs += [v_p, do_p, lse_p[:, :, None, :], delta_p[:, :, None, :]]

    kernel = functools.partial(
        _adapt_from_s(_dkdv_from_s_kernel, dk_in_kernel),
        scale=scale,
        causal=is_causal,
        causal_offset=causal_offset,
        true_nq=nq,
        q_padded=nq_pad != nq,
        dropout_p=float(dropout_p),
        num_q_blocks=num_q_blocks,
        group=group,
        precise_pv=precise_pv,
        dk_in_kernel=dk_in_kernel,
        softcap=float(softcap),
    )

    ds_map = lambda b_, hk, j, gi: (b_, qh(hk, gi), gi % nqb, j)
    dk_dtype = _grad_dtype(grad_kv_storage_dtype, q.dtype)
    out_specs = []
    out_shape = []
    scratch = []
    if dk_in_kernel:
        out_specs.append(
            pl.BlockSpec((1, 1, bkv, d), lambda b_, hk, j, gi: (b_, hk, j, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b, hkv, nkv_pad, d), dk_dtype))
        scratch.append(pltpu.VMEM((bkv, d), jnp.float32))
    out_specs += [
        pl.BlockSpec((1, 1, bkv, dv_dim), lambda b_, hk, j, gi: (b_, hk, j, 0)),
        pl.BlockSpec((1, 1, bq, bkv), ds_map),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((b, hkv, nkv_pad, dv_dim), dk_dtype),
        jax.ShapeDtypeStruct((b, hq, nq_pad, nkv_pad), s_pad.dtype),
    ]
    scratch.append(pltpu.VMEM((bkv, dv_dim), jnp.float32))
    result = pl.pallas_call(
        kernel,
        grid=(b, hkv, num_kv_blocks, group * num_q_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # dS overwrites the S residual in place: each (i, j) block is read
        # and written in the same grid step, and the residual has no other
        # consumer — halves the N^2 HBM footprint. The s input index moves
        # with q_p's presence; the ds output is always last.
        input_output_aliases={1: len(out_shape) - 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    if dk_in_kernel:
        dk, dv, ds_full = result
    else:
        (dv, ds_full), dk = result, None

    if nkv_pad != nkv:
        if dk is not None:
            dk = dk[:, :, :nkv]
        dv = dv[:, :, :nkv]
    dv = dv.astype(_grad_dtype(grad_kv_storage_dtype, v.dtype))
    return dk, dv, ds_full


def _fit_blocks_to_scores(config: BlockConfig, nq_pad, nkv_pad, d, dv, dtype):
    """Pick dkdv blocks that divide the saved S residual's padded layout
    and fit the from-S kernel's VMEM budget."""
    from dataclasses import replace

    from ..env import ENV
    from .config import bwd_dkdv_from_s_vmem_bytes

    limit = ENV.vmem_limit_bytes()
    itemsize = jnp.dtype(dtype).itemsize
    cfg = config
    while nq_pad % cfg.block_q_dkdv != 0 and cfg.block_q_dkdv > LANE:
        cfg = replace(cfg, block_q_dkdv=cfg.block_q_dkdv // 2)
    while nkv_pad % cfg.block_kv_dkdv != 0 and cfg.block_kv_dkdv > LANE:
        cfg = replace(cfg, block_kv_dkdv=cfg.block_kv_dkdv // 2)
    while (
        bwd_dkdv_from_s_vmem_bytes(cfg, d, dv, itemsize) > limit
    ):
        bq, bkv = cfg.block_q_dkdv, cfg.block_kv_dkdv
        if bq >= 2 * LANE and bq >= bkv:
            cfg = replace(cfg, block_q_dkdv=bq // 2)
        elif bkv >= 2 * LANE:
            cfg = replace(cfg, block_kv_dkdv=bkv // 2)
        else:
            break
    return cfg


# ---------------------------------------------------------------------------
# dQ kernel: cell owns a Q tile, streams KV tiles. Optionally emits dBias.
# ---------------------------------------------------------------------------


def _dq_kernel(
    seed_ref,
    alibi_ref,  # optional SMEM (B, Hq) f32
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, bkv, D)
    v_ref,  # (1, 1, bkv, Dv)
    do_ref,  # (1, 1, bq, Dv)
    lse_ref,
    delta_ref,
    bias_ref,  # optional
    dq_ref,  # (1, 1, bq, D) out
    dbias_ref,  # optional (1, 1, bq, bkv) out
    dq_scr,  # VMEM (bq, D) f32
    *,
    scale,
    causal,
    causal_offset,
    true_nkv,
    kv_padded,
    true_nq,
    q_padded,
    dropout_p,
    num_kv_blocks,
    has_bias,
    emit_dbias,
    softcap=0.0,
    window_left=-1,
    window_right=-1,
    has_alibi=False,
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    i = pl.program_id(2)  # q tile owner
    j = pl.program_id(3)  # streamed kv tile

    bq = q_ref.shape[2]
    bkv = k_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    wr_eff = 0 if causal else window_right
    should_run = True
    if causal or window_right >= 0:
        should_run = j * bkv <= (i + 1) * bq - 1 + causal_offset + wr_eff
    if window_left >= 0:
        should_run = jnp.logical_and(
            should_run,
            (j + 1) * bkv - 1 >= i * bq + causal_offset - window_left,
        )
    band = causal or window_left >= 0 or window_right >= 0

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0, 0][:, None]
        delta_row = delta_ref[0, 0, 0][:, None]
        bias = bias_ref[0, 0] if has_bias else None

        _, ds, ds_qk = _recompute_ds(
            q,
            k,
            v,
            do,
            lse_row,
            delta_row,
            scale=scale,
            causal=causal,
            causal_offset=causal_offset,
            true_nkv=true_nkv,
            kv_padded=kv_padded,
            true_nq=true_nq,
            q_padded=q_padded,
            dropout_p=dropout_p,
            seed=seed_ref[0, 0],
            b_idx=b_idx,
            h_idx=h_idx,
            row_start=i * bq,
            col_start=j * bkv,
            bias=bias,
            softcap=softcap,
            window_left=window_left,
            window_right=window_right,
            alibi_slope=alibi_ref[b_idx, h_idx] if has_alibi else None,
        )

        # dQ += scale * dS @ K   (softcap chain factor folded into ds_qk)
        dq_scr[...] += jnp.float32(scale) * lax.dot_general(
            ds_qk.astype(k.dtype),
            k,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if emit_dbias:
            # dBias is the POST-bias score gradient (no softcap factor).
            dbias_ref[0, 0] = ds.astype(dbias_ref.dtype)

    if emit_dbias and band:
        # Skipped out-of-band tiles must still define their dbias block.
        @pl.when(jnp.logical_not(should_run))
        def _zero_dbias():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# Launchers
# ---------------------------------------------------------------------------


def _grad_dtype(storage: Optional[str], default_dtype):
    if storage is None:
        return default_dtype
    return {"f16": jnp.float16, "bf16": jnp.bfloat16, "f32": jnp.float32}[storage]


def flash_attention_backward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    o: jnp.ndarray,
    lse: jnp.ndarray,
    do: jnp.ndarray,
    *,
    scale: float,
    is_causal: bool,
    dropout_p: float = 0.0,
    dropout_seed=0,
    config: Optional[BlockConfig] = None,
    grad_kv_storage_dtype: Optional[str] = None,
    grad_q_storage_dtype: Optional[str] = None,
    interpret: Optional[bool] = None,
    run_dkdv: bool = True,
    run_dq: bool = True,
    ds_handoff: Optional[bool] = None,
    scores: Optional[jnp.ndarray] = None,
    precise_pv: bool = False,
    extra_resident_bytes: int = 0,
    softcap: float = 0.0,
    window: tuple = (-1, -1),
    alibi_slopes: Optional[jnp.ndarray] = None,
):
    """Three-launch backward. Returns (dq, dk, dv, dbias_or_None).

    ``scores`` (optional): the forward's padded S residual
    [B, Hq, nq_pad, nkv_pad] (``flash_attention_forward(return_scores=
    True)``). When present the backward drops its S recompute — the from-S
    dK/dV kernel plus the dS dQ einsum total 4 matmul-equivalents instead
    of 5, and K is no longer read by the dK/dV pass.

    ``k``/``v`` keep their [B, Hkv, Nkv, D] layout; GQA is handled by
    computing per-Q-head dk/dv and group-summing (expand/reduce,
    reference triton/_ffpa_bwd.py:2936-2990).

    ``run_dkdv``/``run_dq`` let the autotuner time each launch in
    isolation (skipped outputs return None).

    ``ds_handoff`` (default: auto by HBM budget) selects the dS-handoff
    scheme: the dK/dV kernel additionally emits the bf16 score gradient
    dS = P*(dP - delta), and dQ becomes a pure XLA matmul
    ``scale * dS @ K`` — eliminating the dQ kernel's S/dP recompute
    (2 of 7 matmul-equivalents; the TPU answer to the recompute flaw the
    reference documents at triton/_ffpa_bwd.py:34-69). Numerics are
    unchanged: the recompute dQ kernel also rounds dS to bf16 before its
    MXU matmul.
    """
    b, hq, nq, d = q.shape
    _, hkv, nkv, _ = k.shape
    dv_dim = v.shape[-1]
    group = hq // hkv

    if config is None:
        from .dispatch import pick_backward_config

        config = pick_backward_config(
            d=d, dv=dv_dim, nq=nq, nkv=nkv, dtype=q.dtype,
            causal=is_causal, has_bias=bias is not None,
            dropout=dropout_p > 0.0, gqa=group > 1,
            group=group if group > 1 else 0,
            # q is already the bf16 COMPUTE dtype here; the f16 cotangent
            # is the surviving primal-dtype signal (drives the store query
            # dtype + the hi+lo dV VMEM tax — see pick_backward_config).
            f16=do.dtype == jnp.float16,
        )
    config = config.clamp(nq, nkv)

    interpret = use_interpret() if interpret is None else interpret
    seed_arr = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)

    window_left = int(window[0])
    window_right = -1 if is_causal else int(window[1])
    window_active = window_left >= 0 or window_right >= 0
    alibi = None
    if alibi_slopes is not None:
        alibi = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi.ndim == 1:
            alibi = jnp.broadcast_to(alibi[None], (b, hq))
    if window_active and scores is not None:
        raise ValueError(
            "S-resident backward is not defined for sliding windows "
            "(out-of-band S tiles are never written); callers gate "
            "save_scores off (ops/attention.py)"
        )
    if softcap > 0.0 and scores is not None and (
        bias is not None or alibi is not None
    ):
        raise ValueError(
            "S-resident backward with softcap requires a bias/alibi-free "
            "call (the tanh chain factor is recovered from the saved S)"
        )
    if window_active or (
        softcap > 0.0 and (bias is not None or alibi is not None)
    ):
        # Sliding windows want the band-skipping recompute kernels (an N^2
        # dS slab defeats the O(N*W) point); softcap+bias needs the in-
        # kernel split of ds (bias grad) vs ds_qk (matmul grad).
        ds_handoff = False

    # Preprocess: delta = rowsum(dO * O) — XLA-fused (reference launch 1,
    # triton/_ffpa_bwd.py:2275-2322). Computed BEFORE any dO cast so f16
    # cotangents contribute exactly.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    # f16 cotangent: kernels stream bf16; split off the low bf16 part so
    # the precise dV matmul can restore the full f16 mantissa
    # (_dv_accumulate; fp16 1e-2 contract).
    do_lo = None
    f16_cotangent = do.dtype == jnp.float16
    if f16_cotangent:
        from ..env import ENV

        do32 = do.astype(jnp.float32)
        do = do.astype(jnp.bfloat16)
        mode = ENV.f16_pv_mode()
        if precise_pv and mode == "plain":
            # Experimental cheap mode: single bf16 dV matmul (5 backward
            # units). The measured contract table in docs/design.md
            # governs whether this may ship as a default.
            precise_pv = False
        if precise_pv and mode == "hilo":
            do_lo = (do32 - do.astype(jnp.float32)).astype(jnp.bfloat16)

    causal_offset = nkv - nq

    if scores is not None and run_dkdv and run_dq:
        nq_pad, nkv_pad = scores.shape[2], scores.shape[3]
        config = _fit_blocks_to_scores(config, nq_pad, nkv_pad, d, dv_dim, q.dtype)
        dk, dv, ds_full = _dkdv_from_s_launch(
            q, v, scores, do, lse, delta, seed_arr, config,
            scale=scale, is_causal=is_causal, causal_offset=causal_offset,
            dropout_p=dropout_p, group=group,
            grad_kv_storage_dtype=grad_kv_storage_dtype,
            interpret=interpret, precise_pv=precise_pv, softcap=softcap,
        )
        dq_dtype = _grad_dtype(grad_q_storage_dtype, q.dtype)
        if dk is None:
            # Accumulator-split dispatch: dK from the dS slab (banded
            # kernel under causal so skipped tiles stay free).
            dk_dtype = _grad_dtype(grad_kv_storage_dtype, k.dtype)
            if is_causal:
                dk = _banded_dk_from_ds(
                    ds_full, q, config,
                    scale=scale, group=group, nq=nq, nkv=nkv,
                    causal_offset=causal_offset, dk_dtype=dk_dtype,
                    interpret=interpret,
                )
            else:
                dk = _dk_from_ds(
                    ds_full, q, scale=scale, group=group, nq=nq, nkv=nkv,
                    dk_dtype=dk_dtype,
                )
        if is_causal:
            dq = _banded_dq_from_ds(
                ds_full, k, config,
                scale=scale, group=group, nq=nq, nkv=nkv,
                causal_offset=causal_offset,
                dq_dtype=dq_dtype, interpret=interpret,
            )
            dbias = None
            if bias is not None:
                dbias = _dbias_from_ds(
                    ds_full[:, :, :nq, :nkv], bias
                ).astype(bias.dtype)
        else:
            dq, dbias = _dq_from_ds(
                ds_full, k, bias,
                scale=scale, group=group, nq=nq, nkv=nkv, dq_dtype=dq_dtype,
            )
        return dq, dk, dv, dbias

    # The recompute paths below keep dK in-kernel (the accumulator-split
    # dispatch is implemented for the from-S path, where dropping dK also
    # drops the whole Q stream).
    if not config.dkdv_dk_in_kernel:
        from dataclasses import replace as _replace

        config = _replace(config, dkdv_dk_in_kernel=True)

    # Handoff decision + KV striping: the dS buffer is bounded by the env
    # budget; when the full [B,Hq,Nq,Nkv] doesn't fit, process KV in
    # bkv-aligned stripes — each stripe emits its dS slab, contributes its
    # dK/dV slice, and folds into dQ via one einsum — so the recompute-free
    # scheme extends to arbitrary sequence lengths with O(limit) memory.
    from ..env import ENV

    itemsize = jnp.dtype(q.dtype).itemsize
    # fp8 dS storage only for the pure-bf16 BIAS-FREE path WITH the
    # explicit opt-in (env.py allow_fp8_ds: the ~5% worst-element dq noise
    # sits at the 5e-2 contract boundary). An fp16 cotangent (the
    # production fp16 route sends bf16 primals + f16 dO) means the 1e-2
    # contract applies, which leaves no quantization margin; a bias means
    # dbias is summed straight off the stored slab (_dbias_from_ds) and
    # would inherit the noise the docs promise lands on dQ only.
    if config.ds_store_bits == 8 and (
        q.dtype != jnp.bfloat16
        or f16_cotangent
        or bias is not None
        or not ENV.allow_fp8_ds()
    ):
        from dataclasses import replace as _replace_cfg

        config = _replace_cfg(config, ds_store_bits=16)
    ds_itemsize = config.ds_store_bits // 8
    limit = ENV.ds_handoff_limit_bytes()
    bq_h, bkv_h0 = config.block_q_dkdv, config.block_kv_dkdv
    ds_bytes = (
        b * hq * cdiv(nq, bq_h) * bq_h
        * cdiv(nkv, bkv_h0) * bkv_h0 * ds_itemsize
    )
    if ds_handoff is None:
        # Auto gate: the largest live slab (one stripe, <= limit) must also
        # fit the call's actual HBM headroom — total HBM minus this call's
        # resident tensors (q/k/v/o/do + the three grads; attention is not
        # the only tenant, so a further model-residency margin applies).
        # Striping bounds slab size, so the binding constraint is headroom,
        # not total dS (the old `8 * limit` fudge).
        # extra_resident_bytes: co-resident HBM this call cannot see from
        # its own operands — the hybrid partial-residency backward passes
        # the sibling head-range's live S slab here (ops/attention.py).
        residents = itemsize * (
            2 * q.size + 2 * k.size + 2 * v.size + 2 * do.size
        ) + (0 if bias is None else bias.size * 4) + extra_resident_bytes
        headroom = ENV.hbm_bytes() - residents - ENV.hbm_model_margin_bytes()
        slab_limit = min(limit, max(headroom, 0))
        ds_handoff = slab_limit > 0 and (
            ds_bytes <= slab_limit
            # striped: per-slab bound; worth it while stripes stay coarse
            or cdiv(ds_bytes, max(slab_limit, 1)) <= 8
        )
        limit = slab_limit if slab_limit > 0 else limit
    ds_handoff = ds_handoff and run_dkdv and run_dq
    if ds_handoff:
        config = _fit_dkdv_for_ds(
            config, d, dv_dim, q.dtype, bias is not None,
            precise_pv=precise_pv and f16_cotangent,
        )

    if ds_handoff:
        bkv_h = config.block_kv_dkdv
        bq_h = config.block_q_dkdv
        n_stripes = max(1, cdiv(ds_bytes, max(limit, 1)))
        stripe_cols = cdiv(cdiv(nkv, n_stripes), bkv_h) * bkv_h
        dq_dtype = _grad_dtype(grad_q_storage_dtype, q.dtype)
        single = stripe_cols >= nkv
        dq_acc = (
            None if single
            else jnp.zeros((b, hq, nq, d), jnp.float32)
        )
        dk_parts, dv_parts, dbias_parts = [], [], []
        for lo in range(0, nkv, stripe_cols):
            hi = min(nkv, lo + stripe_cols)
            # Causal: Q rows < lo - offset cannot see this KV stripe, so
            # slice them off — later stripes get proportionally smaller dS
            # slabs, grids and dq updates (the stripe loop's cost follows
            # the causal triangle instead of the full rectangle).
            row_start = 0
            if is_causal and lo > causal_offset:
                row_start = ((lo - causal_offset) // bq_h) * bq_h
            k_s = k[:, :, lo:hi] if (lo, hi) != (0, nkv) else k
            v_s = v[:, :, lo:hi] if (lo, hi) != (0, nkv) else v
            q_s, do_s, lse_s, delta_s = q, do, lse, delta
            do_lo_s = do_lo
            if row_start:
                q_s = q[:, :, row_start:]
                do_s = do[:, :, row_start:]
                lse_s = lse[:, :, row_start:]
                delta_s = delta[:, :, row_start:]
                if do_lo is not None:
                    do_lo_s = do_lo[:, :, row_start:]
            bias_s = bias
            if bias is not None:
                if bias.shape[3] != 1:
                    bias_s = bias_s[:, :, :, lo:hi]
                if row_start and bias.shape[2] != 1:
                    bias_s = bias_s[:, :, row_start:]
            local_off = causal_offset - lo + row_start
            dk_s, dv_s, ds_s = _dkdv_launch(
                q_s, k_s, v_s, bias_s, do_s, lse_s, delta_s, seed_arr,
                config,
                scale=scale, is_causal=is_causal,
                causal_offset=local_off,
                dropout_p=dropout_p, group=group,
                grad_kv_storage_dtype=grad_kv_storage_dtype,
                interpret=interpret, emit_ds=True, col_offset=lo,
                row_offset=row_start, precise_pv=precise_pv, do_lo=do_lo_s,
                softcap=softcap, alibi=alibi,
            )
            dk_parts.append(dk_s)
            dv_parts.append(dv_s)
            nq_loc = nq - row_start
            if is_causal:
                # Banded kernel: above-diagonal dS tiles are skipped
                # (the XLA einsum would burn the full N^2).
                dq_s = _banded_dq_from_ds(
                    ds_s, k_s, config,
                    scale=scale, group=group, nq=nq_loc, nkv=hi - lo,
                    causal_offset=local_off,
                    dq_dtype=dq_dtype if single else jnp.float32,
                    interpret=interpret,
                )
                dbias_s = None
                if bias is not None:
                    dbias_s = _dbias_from_ds(
                        ds_s[:, :, :nq_loc, : hi - lo], bias
                    )
            else:
                dq_s, dbias_s = _dq_from_ds(
                    ds_s, k_s, bias_s,
                    scale=scale, group=group, nq=nq_loc, nkv=hi - lo,
                    dq_dtype=dq_dtype if single else jnp.float32,
                )
            if single:
                dq_acc = dq_s
            elif row_start:
                dq_acc = dq_acc.at[:, :, row_start:].add(dq_s)
            else:
                dq_acc = dq_acc + dq_s
            if dbias_s is not None:
                dbias_parts.append((row_start, dbias_s))
        dq = dq_acc if single else dq_acc.astype(dq_dtype)
        dk = dk_parts[0] if len(dk_parts) == 1 else jnp.concatenate(dk_parts, axis=2)
        dv = dv_parts[0] if len(dv_parts) == 1 else jnp.concatenate(dv_parts, axis=2)
        dbias = None
        if bias is not None:
            parts = dbias_parts
            if bias.shape[3] != 1:
                # Column-striped parts; rows may be sliced — scatter each
                # part into the full [.., Nq|1, Nkv] gradient.
                full_rows = bias.shape[2] != 1
                cols = [p.shape[3] for _, p in parts]
                if not full_rows or all(rs == 0 for rs, _ in parts):
                    dbias = jnp.concatenate([p for _, p in parts], axis=3)
                else:
                    dbias = jnp.zeros(
                        bias.shape[:3] + (sum(cols),), jnp.float32
                    )
                    off = 0
                    for rs, p in parts:
                        dbias = lax.dynamic_update_slice(
                            dbias, p.astype(jnp.float32), (0, 0, rs, off)
                        )
                        off += p.shape[3]
            else:
                dbias = None
                for rs, p in parts:
                    if bias.shape[2] != 1 and rs:
                        p = jnp.pad(
                            p, ((0, 0),) * 2 + ((rs, 0), (0, 0))
                        )
                    dbias = p if dbias is None else dbias + p
            dbias = dbias.astype(bias.dtype)
        return dq, dk, dv, dbias

    if run_dkdv:
        dk, dv, _ = _dkdv_launch(
            q, k, v, bias, do, lse, delta, seed_arr, config,
            scale=scale, is_causal=is_causal, causal_offset=causal_offset,
            dropout_p=dropout_p, group=group,
            grad_kv_storage_dtype=grad_kv_storage_dtype,
            interpret=interpret, emit_ds=False, precise_pv=precise_pv,
            do_lo=do_lo, softcap=softcap, window=window, alibi=alibi,
        )
    else:
        dk = dv = None

    if run_dq:
        dq, dbias = _dq_launch(
            q, k, v, bias, do, lse, delta, seed_arr, config,
            scale=scale, is_causal=is_causal, causal_offset=causal_offset,
            dropout_p=dropout_p, group=group,
            grad_q_storage_dtype=grad_q_storage_dtype,
            interpret=interpret, softcap=softcap, window=window, alibi=alibi,
        )
    else:
        dq = dbias = None

    return dq, dk, dv, dbias


def _fit_dkdv_for_ds(
    config: BlockConfig, d, dv, dtype, has_bias, precise_pv: bool = False
) -> BlockConfig:
    """Shrink the dK/dV owner/stream blocks until the extra dS output block
    fits the VMEM budget (the handoff adds 2*bq*bkv*itemsize of output
    double-buffer the plain kernel doesn't carry; ``precise_pv`` adds the
    fp16 hi+lo tax — see config.bwd_dkdv_vmem_bytes)."""
    from dataclasses import replace

    from ..env import ENV
    from .config import LANE, bwd_dkdv_vmem_bytes

    limit = ENV.vmem_limit_bytes()
    itemsize = jnp.dtype(dtype).itemsize
    cfg = config
    while (
        bwd_dkdv_vmem_bytes(
            cfg, d, dv, itemsize, has_bias, emit_ds=True,
            precise_pv=precise_pv,
        )
        > limit
    ):
        bq, bkv = cfg.block_q_dkdv, cfg.block_kv_dkdv
        if bq >= 2 * LANE and bq >= bkv:
            cfg = replace(cfg, block_q_dkdv=bq // 2)
        elif bkv >= 2 * LANE:
            cfg = replace(cfg, block_kv_dkdv=bkv // 2)
        else:
            break
    return cfg


def _banded_dq_kernel(
    ds_ref,  # (1, 1, bq, bkv)
    k_ref,  # (1, 1, bkv, D)
    dq_ref,  # (1, 1, bq, D) out
    dq_scr,  # VMEM (bq, D) f32
    *,
    scale,
    causal_offset,
    num_kv_blocks,
):
    """dQ += scale * dS @ K with causal tile skipping — the handoff's dQ
    matmul as a Pallas kernel so above-diagonal dS tiles cost neither
    bandwidth (index-map clamp elides the DMA) nor MXU time."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    bq = ds_ref.shape[2]
    bkv = k_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = j * bkv <= (i + 1) * bq - 1 + causal_offset

    @pl.when(should_run)
    def _compute():
        ds = ds_ref[0, 0]
        k = k_ref[0, 0]
        if ds.dtype == jnp.float8_e4m3fn:
            ds = ds.astype(k.dtype)  # fp8-stored slab; MXU wants bf16
        dq_scr[...] += jnp.float32(scale) * lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _banded_dq_from_ds(
    ds_full, k, config, *, scale, group, nq, nkv, causal_offset, dq_dtype,
    interpret,
):
    """Causal dQ from handed-off dS via the tile-skipping kernel.

    ``ds_full`` is [B, Hq, nq_pad, nkv_pad] (the dkdv launch's padded
    grid); padded regions hold zeros. ``causal_offset`` is the LOCAL
    offset of this KV stripe (global offset minus stripe start).
    """
    b, hq, nq_pad, nkv_pad = ds_full.shape
    d = k.shape[-1]
    bkv = config.block_kv_dkdv
    # Tall Q panels: the kernel's K re-read factor is nq/bq and its VMEM
    # needs are small (no scores/softmax), so take the largest panel that
    # divides the dS grid and fits the budget.
    from ..env import ENV

    limit = ENV.vmem_limit_bytes()
    bq = config.block_q_dkdv
    for cand in (4096, 2048, 1024):
        vmem = (
            2 * cand * bkv * ds_full.dtype.itemsize  # ds blocks
            + 2 * bkv * d * k.dtype.itemsize  # k blocks
            + cand * d * 4  # dq scratch
            + 2 * cand * d * 4  # dq out blocks
        )
        if cand > bq and nq_pad % cand == 0 and vmem <= limit:
            bq = cand
            break
    num_q_blocks = nq_pad // bq
    num_kv_blocks = nkv_pad // bkv
    k_p = _pad_dim(k, 2, nkv_pad)

    def kvj_index(b_, h, i, j, bq=bq, bkv=bkv, off=causal_offset):
        j_max = ((i + 1) * bq - 1 + off) // bkv
        return jnp.minimum(j, jnp.maximum(j_max, 0))

    kernel = functools.partial(
        _banded_dq_kernel,
        scale=scale,
        causal_offset=causal_offset,
        num_kv_blocks=num_kv_blocks,
    )
    dq = pl.pallas_call(
        kernel,
        grid=(b, hq, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, bkv),
                lambda b_, h, i, j: (b_, h, i, kvj_index(b_, h, i, j)),
            ),
            pl.BlockSpec(
                (1, 1, bkv, d),
                lambda b_, h, i, j, g=group: (
                    b_, h // g, kvj_index(b_, h, i, j), 0
                ),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0))
        ],
        out_shape=[jax.ShapeDtypeStruct((b, hq, nq_pad, d), dq_dtype)],
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(ds_full, k_p)[0]
    return dq[:, :, :nq]


def _dk_from_ds(ds_full, q, *, scale, group, nq, nkv, dk_dtype):
    """dK from the materialized score gradient: ``dk = scale * dS^T @ Q``
    — the out-of-kernel half of the accumulator-split dispatch
    (config.BlockConfig.dkdv_dk_in_kernel; the TPU analog of the
    reference's M4N2 layout at D>=768, split_d_m4n2.cuh:29-47). One
    MXU-shaped einsum with the GQA group reduced in fp32."""
    b, hq = ds_full.shape[:2]
    hkv = hq // group
    ds_c = ds_full[:, :, :nq, :nkv]
    q_c = q[:, :, :nq]
    if group > 1:
        ds_g = ds_c.reshape(b, hkv, group, nq, ds_c.shape[-1])
        q_g = q_c.reshape(b, hkv, group, nq, q.shape[-1])
        dk = jnp.einsum(
            "bhgqk,bhgqd->bhkd", ds_g, q_g,
            preferred_element_type=jnp.float32,
        )
    else:
        dk = jnp.einsum(
            "bhqk,bhqd->bhkd", ds_c, q_c,
            preferred_element_type=jnp.float32,
        )
    return (jnp.float32(scale) * dk).astype(dk_dtype)


def _banded_dk_kernel(
    ds_ref,  # (1, 1, bq, bkv)
    q_ref,  # (1, 1, bq, D)
    dk_ref,  # (1, 1, bkv, D) out
    dk_scr,  # VMEM (bkv, D) f32
    *,
    scale,
    causal_offset,
    num_q_blocks,
    group,
):
    """dK += scale * dS^T @ Q with causal tile skipping — the banded-dq
    kernel's mirror for the out-of-kernel dK half (above-diagonal dS tiles
    cost neither bandwidth nor MXU time)."""
    gi = pl.program_id(3)
    j = pl.program_id(2)
    i = gi % num_q_blocks
    bq = ds_ref.shape[2]
    bkv = ds_ref.shape[3]

    @pl.when(gi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)

    should_run = j * bkv <= (i + 1) * bq - 1 + causal_offset

    @pl.when(should_run)
    def _compute():
        ds = ds_ref[0, 0]
        q = q_ref[0, 0]
        dk_scr[...] += jnp.float32(scale) * lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(gi == group * num_q_blocks - 1)
    def _epilogue():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)


def _banded_dk_from_ds(
    ds_full, q, config, *, scale, group, nq, nkv, causal_offset, dk_dtype,
    interpret,
):
    """Causal dK from the dS slab via the tile-skipping kernel. ``ds_full``
    is the padded [B, Hq, nq_pad, nkv_pad] slab (zeros above the band)."""
    b, hq, nq_pad, nkv_pad = ds_full.shape
    d = q.shape[-1]
    hkv = hq // group
    bq = config.block_q_dkdv
    bkv = config.block_kv_dkdv
    num_q_blocks = nq_pad // bq
    num_kv_blocks = nkv_pad // bkv
    q_p = _pad_dim(q, 2, nq_pad)
    nqb = num_q_blocks

    def qi_index(j, i, bq=bq, bkv=bkv, off=causal_offset):
        i_min = jnp.maximum(0, -(-(j * bkv + 1 - off) // bq) - 1)
        return jnp.maximum(i, i_min)

    def qh(hk, gi, g=group):
        return hk * g + gi // nqb

    def qi(j, gi):
        return qi_index(j, gi % nqb)

    kernel = functools.partial(
        _banded_dk_kernel,
        scale=scale,
        causal_offset=causal_offset,
        num_q_blocks=num_q_blocks,
        group=group,
    )
    dk = pl.pallas_call(
        kernel,
        grid=(b, hkv, num_kv_blocks, group * num_q_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, bkv),
                lambda b_, hk, j, gi: (b_, qh(hk, gi), qi(j, gi), j),
            ),
            pl.BlockSpec(
                (1, 1, bq, d),
                lambda b_, hk, j, gi: (b_, qh(hk, gi), qi(j, gi), 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bkv, d), lambda b_, hk, j, gi: (b_, hk, j, 0))
        ],
        out_shape=[jax.ShapeDtypeStruct((b, hkv, nkv_pad, d), dk_dtype)],
        scratch_shapes=[pltpu.VMEM((bkv, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(ds_full, q_p)[0]
    return dk[:, :, :nkv]


def _dbias_from_ds(ds_c, bias):
    """Bias gradient: sum the (cropped) score gradient over the bias's
    broadcast axes (reference aten/_efficient_bwd.py:185-186)."""
    dbias_full = ds_c.astype(jnp.float32)
    axes = tuple(ax for ax, sz in enumerate(bias.shape) if sz == 1)
    return dbias_full.sum(axis=axes, keepdims=True) if axes else dbias_full


def _dq_from_ds(ds_full, k, bias, *, scale, group, nq, nkv, dq_dtype):
    """dQ (and dBias) from the handed-off score gradient.

    ``dq = scale * dS @ K`` — one MXU-shaped einsum XLA schedules at peak;
    ``dbias = sum_to_size(dS)`` (reference aten/_efficient_bwd.py:185-186).
    """
    b, hq = ds_full.shape[:2]
    hkv = k.shape[1]
    ds_c = ds_full[:, :, :nq, :nkv]
    if ds_c.dtype == jnp.float8_e4m3fn:
        # fp8-stored handoff slab: upcast feeds the dot as an operand
        # fusion (the HBM stream stays 1 byte/element).
        ds_c = ds_c.astype(k.dtype)
    if group > 1:
        ds_g = ds_c.reshape(b, hkv, group, nq, nkv)
        dq = jnp.einsum(
            "bhgqk,bhkd->bhgqd", ds_g, k,
            preferred_element_type=jnp.float32,
        ).reshape(b, hq, nq, k.shape[-1])
    else:
        dq = jnp.einsum(
            "bhqk,bhkd->bhqd", ds_c, k,
            preferred_element_type=jnp.float32,
        )
    dq = (jnp.float32(scale) * dq).astype(dq_dtype)

    dbias = None
    if bias is not None:
        dbias_full = ds_c.astype(jnp.float32)
        axes = tuple(ax for ax, sz in enumerate(bias.shape) if sz == 1)
        dbias = (
            dbias_full.sum(axis=axes, keepdims=True) if axes else dbias_full
        ).astype(bias.dtype)
    return dq, dbias


def _dkdv_launch(
    q, k, v, bias, do, lse, delta, seed_arr, config,
    *, scale, is_causal, causal_offset, dropout_p, group,
    grad_kv_storage_dtype, interpret, emit_ds=False, col_offset=0,
    row_offset=0, precise_pv=False, do_lo=None,
    softcap=0.0, window=(-1, -1), alibi=None,
):
    b, hq, nq, d = q.shape
    _, hkv, nkv, _ = k.shape
    dv_dim = v.shape[-1]
    bq, bkv = config.block_q_dkdv, config.block_kv_dkdv
    nq_pad = cdiv(nq, bq) * bq
    nkv_pad = cdiv(nkv, bkv) * bkv
    q_p = _pad_dim(q, 2, nq_pad)
    do_p = _pad_dim(do, 2, nq_pad)
    lse_p = _pad_dim(lse, 2, nq_pad)
    delta_p = _pad_dim(delta, 2, nq_pad)
    k_p = _pad_dim(k, 2, nkv_pad)
    v_p = _pad_dim(v, 2, nkv_pad)

    num_q_blocks = nq_pad // bq
    num_kv_blocks = nkv_pad // bkv

    has_bias = bias is not None
    bias_dkdv, bias_block_dkdv, bias_map_dkdv = _bias_spec(
        bias, bq, bkv, nq_pad, nkv_pad, kv_major=True
    )

    nqb = num_q_blocks
    window_left = int(window[0])
    window_right = -1 if is_causal else int(window[1])
    upper_band = is_causal or window_right >= 0
    wr_eff = 0 if is_causal else window_right

    if upper_band or window_left >= 0:
        # Clamp the streamed Q index to the band of tiles that attend this
        # KV tile — Pallas elides DMAs for the (masked) repeats; same trick
        # as the forward KV clamp, with a lower bound for sliding windows.
        def qi_index(j, i, bq=bq, bkv=bkv, off=causal_offset):
            ii = i
            if upper_band:
                i_min = jnp.maximum(
                    0, -(-(j * bkv + 1 - off - wr_eff) // bq) - 1
                )
                ii = jnp.maximum(ii, i_min)
            if window_left >= 0:
                i_max = jnp.clip(
                    ((j + 1) * bkv - 1 + window_left - off) // bq,
                    0,
                    nqb - 1,
                )
                ii = jnp.minimum(ii, i_max)
            return ii

    else:

        def qi_index(j, i):
            return i

    # Grid axis 3 folds (group, q-tile): gi = g*nqb + i; the q-side index
    # maps address q-head hk*group + g so dK/dV group-accumulate in VMEM.
    def qh(hk, gi, g=group):
        return hk * g + gi // nqb

    def qi(j, gi):
        return qi_index(j, gi % nqb)

    do_spec = pl.BlockSpec(
        (1, 1, bq, dv_dim),
        lambda b_, hk, j, gi: (b_, qh(hk, gi), qi(j, gi), 0),
    )
    has_alibi = alibi is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [seed_arr]
    if has_alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (B, Hq) f32
        inputs.append(alibi)
    in_specs += [
        pl.BlockSpec(
            (1, 1, bq, d), lambda b_, hk, j, gi: (b_, qh(hk, gi), qi(j, gi), 0)
        ),
        pl.BlockSpec((1, 1, bkv, d), lambda b_, hk, j, gi: (b_, hk, j, 0)),
        pl.BlockSpec((1, 1, bkv, dv_dim), lambda b_, hk, j, gi: (b_, hk, j, 0)),
        do_spec,
    ]
    inputs += [q_p, k_p, v_p, do_p]
    has_dolo = do_lo is not None
    if has_dolo:
        in_specs.append(do_spec)
        inputs.append(_pad_dim(do_lo, 2, nq_pad))
    in_specs += [
        pl.BlockSpec(
            (1, 1, 1, bq), lambda b_, hk, j, gi: (b_, qh(hk, gi), 0, qi(j, gi))
        ),
        pl.BlockSpec(
            (1, 1, 1, bq), lambda b_, hk, j, gi: (b_, qh(hk, gi), 0, qi(j, gi))
        ),
    ]
    inputs += [lse_p[:, :, None, :], delta_p[:, :, None, :]]
    if has_bias:
        bm = bias_map_dkdv

        def bias_map_folded(b_, hk, j, gi, bm=bm):
            return bm(b_, qh(hk, gi), j, qi(j, gi))

        in_specs.append(pl.BlockSpec(bias_block_dkdv, bias_map_folded))
        inputs.append(bias_dkdv)

    dkdv_kernel = functools.partial(
        _adapt_dkdv(_dkdv_kernel, has_bias, emit_ds, has_dolo, has_alibi),
        scale=scale,
        causal=is_causal,
        causal_offset=causal_offset,
        true_nkv=nkv,
        kv_padded=nkv_pad != nkv,
        true_nq=nq,
        q_padded=nq_pad != nq,
        dropout_p=float(dropout_p),
        num_q_blocks=num_q_blocks,
        has_bias=has_bias,
        emit_ds=emit_ds,
        col_offset=col_offset,
        row_offset=row_offset,
        group=group,
        precise_pv=precise_pv,
        softcap=float(softcap),
        window_left=window_left,
        window_right=window_right,
        has_alibi=has_alibi,
    )

    dk_dtype = _grad_dtype(grad_kv_storage_dtype, k.dtype)
    out_specs = [
        pl.BlockSpec((1, 1, bkv, d), lambda b_, hk, j, gi: (b_, hk, j, 0)),
        pl.BlockSpec((1, 1, bkv, dv_dim), lambda b_, hk, j, gi: (b_, hk, j, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, hkv, nkv_pad, d), dk_dtype),
        jax.ShapeDtypeStruct((b, hkv, nkv_pad, dv_dim), dk_dtype),
    ]
    if emit_ds:
        ds_map = lambda b_, hk, j, gi: (b_, qh(hk, gi), gi % nqb, j)
        out_specs.append(pl.BlockSpec((1, 1, bq, bkv), ds_map))
        ds_dtype = (
            jnp.float8_e4m3fn if config.ds_store_bits == 8 else q.dtype
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, hq, nq_pad, nkv_pad), ds_dtype)
        )
    result = pl.pallas_call(
        dkdv_kernel,
        grid=(b, hkv, num_kv_blocks, group * num_q_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, dv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    if emit_ds:
        dk, dv, ds_full = result
    else:
        dk, dv = result
        ds_full = None

    if nkv_pad != nkv:
        dk = dk[:, :, :nkv]
        dv = dv[:, :, :nkv]
    dv = dv.astype(_grad_dtype(grad_kv_storage_dtype, v.dtype))
    return dk, dv, ds_full


def _dq_launch(
    q, k, v, bias, do, lse, delta, seed_arr, config,
    *, scale, is_causal, causal_offset, dropout_p, group,
    grad_q_storage_dtype, interpret,
    softcap=0.0, window=(-1, -1), alibi=None,
):
    b, hq, nq, d = q.shape
    _, hkv, nkv, _ = k.shape
    dv_dim = v.shape[-1]
    has_bias = bias is not None
    bq, bkv = config.block_q_dq, config.block_kv_dq
    nq_pad = cdiv(nq, bq) * bq
    nkv_pad = cdiv(nkv, bkv) * bkv
    q_p = _pad_dim(q, 2, nq_pad)
    do_p = _pad_dim(do, 2, nq_pad)
    lse_p = _pad_dim(lse, 2, nq_pad)
    delta_p = _pad_dim(delta, 2, nq_pad)
    k_p = _pad_dim(k, 2, nkv_pad)
    v_p = _pad_dim(v, 2, nkv_pad)
    num_q_blocks = nq_pad // bq
    num_kv_blocks = nkv_pad // bkv

    bias_dq, bias_block_dq, bias_map_dq = _bias_spec(
        bias, bq, bkv, nq_pad, nkv_pad, kv_major=False
    )
    emit_dbias = has_bias
    window_left = int(window[0])
    window_right = -1 if is_causal else int(window[1])
    upper_band = is_causal or window_right >= 0
    wr_eff = 0 if is_causal else window_right

    if upper_band or window_left >= 0:

        def kvj_index(b_, h, i, j, bq=bq, bkv=bkv, off=causal_offset):
            jj = j
            if upper_band:
                j_max = jnp.maximum(((i + 1) * bq - 1 + off + wr_eff) // bkv, 0)
                jj = jnp.minimum(jj, j_max)
            if window_left >= 0:
                j_min = jnp.clip(
                    (i * bq + off - window_left) // bkv, 0, num_kv_blocks - 1
                )
                jj = jnp.maximum(jj, j_min)
            return jj

    else:

        def kvj_index(b_, h, i, j):
            return j

    has_alibi = alibi is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [seed_arr]
    if has_alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (B, Hq) f32
        inputs.append(alibi)
    in_specs += [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec(
            (1, 1, bkv, d),
            lambda b_, h, i, j, g=group: (b_, h // g, kvj_index(b_, h, i, j), 0),
        ),
        pl.BlockSpec(
            (1, 1, bkv, dv_dim),
            lambda b_, h, i, j, g=group: (b_, h // g, kvj_index(b_, h, i, j), 0),
        ),
        pl.BlockSpec((1, 1, bq, dv_dim), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec((1, 1, 1, bq), lambda b_, h, i, j: (b_, h, 0, i)),
        pl.BlockSpec((1, 1, 1, bq), lambda b_, h, i, j: (b_, h, 0, i)),
    ]
    inputs += [q_p, k_p, v_p, do_p, lse_p[:, :, None, :], delta_p[:, :, None, :]]
    if has_bias:
        in_specs.append(pl.BlockSpec(bias_block_dq, bias_map_dq))
        inputs.append(bias_dq)

    dq_kernel = functools.partial(
        _adapt_dq(_dq_kernel, has_bias, emit_dbias, has_alibi),
        scale=scale,
        causal=is_causal,
        causal_offset=causal_offset,
        true_nkv=nkv,
        kv_padded=nkv_pad != nkv,
        true_nq=nq,
        q_padded=nq_pad != nq,
        dropout_p=float(dropout_p),
        num_kv_blocks=num_kv_blocks,
        has_bias=has_bias,
        emit_dbias=emit_dbias,
        softcap=float(softcap),
        window_left=window_left,
        window_right=window_right,
        has_alibi=has_alibi,
    )

    out_specs = [pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0))]
    out_shape = [
        jax.ShapeDtypeStruct(
            (b, hq, nq_pad, d), _grad_dtype(grad_q_storage_dtype, q.dtype)
        )
    ]
    if emit_dbias:
        out_specs.append(
            pl.BlockSpec((1, 1, bq, bkv), lambda b_, h, i, j: (b_, h, i, j))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, hq, nq_pad, nkv_pad), jnp.float32)
        )

    result = pl.pallas_call(
        dq_kernel,
        grid=(b, hq, num_q_blocks, num_kv_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    if emit_dbias:
        dq, dbias_full = result
    else:
        (dq,) = result if isinstance(result, (list, tuple)) else (result,)
        dbias_full = None

    if dq.shape[2] != nq:
        dq = dq[:, :, :nq]

    dbias = None
    if dbias_full is not None:
        dbias_full = dbias_full[:, :, :nq, :nkv]
        # Reduce to the compact broadcast bias shape (reference sum_to_size,
        # aten/_efficient_bwd.py:185-186).
        axes = tuple(
            ax for ax, sz in enumerate(bias.shape) if sz == 1
        )
        dbias = (
            dbias_full.sum(axis=axes, keepdims=True) if axes else dbias_full
        ).astype(bias.dtype)

    return dq, dbias


def _bias_spec(bias, bq, bkv, nq_pad, nkv_pad, kv_major: bool):
    """Build (padded_bias, block_shape, index_map) for broadcast-compact bias.

    Bias dims are always (B|1, H|1, Nq|1, Nkv|1). ``kv_major=True`` means
    the grid's 3rd dim walks KV tiles and the 4th walks Q tiles (the dK/dV
    grid); otherwise the dQ/forward ordering (q-major).
    """
    if bias is None:
        return None, None, None
    block = [1, 1, 1, 1]
    if bias.shape[2] != 1:
        bias = _pad_dim(bias, 2, nq_pad)
        block[2] = bq
    if bias.shape[3] != 1:
        bias = _pad_dim(bias, 3, nkv_pad)
        block[3] = bkv
    shape = bias.shape

    def index_map(b_, h, x, y, shape=shape, kv_major=kv_major):
        i, j = (y, x) if kv_major else (x, y)
        return (
            b_ if shape[0] != 1 else 0,
            h if shape[1] != 1 else 0,
            i if shape[2] != 1 else 0,
            j if shape[3] != 1 else 0,
        )

    return bias, tuple(block), index_map


def _adapt_dkdv(
    kernel, has_bias: bool, emit_ds: bool, has_dolo: bool = False,
    has_alibi: bool = False,
):
    """Map the actual pallas ref list to the full _dkdv_kernel signature."""

    @functools.wraps(kernel)
    def wrapped(*refs, **kw):
        refs = list(refs)
        pos = 0
        seed_ref = refs[pos]
        pos += 1
        alibi_ref = refs[pos] if has_alibi else None
        if has_alibi:
            pos += 1
        q_ref, k_ref, v_ref, do_ref = refs[pos : pos + 4]
        pos += 4
        do_lo_ref = refs[pos] if has_dolo else None
        if has_dolo:
            pos += 1
        lse_ref, delta_ref = refs[pos : pos + 2]
        pos += 2
        bias_ref = refs[pos] if has_bias else None
        if has_bias:
            pos += 1
        dk_ref, dv_ref = refs[pos : pos + 2]
        pos += 2
        ds_ref = refs[pos] if emit_ds else None
        if emit_ds:
            pos += 1
        dk_scr, dv_scr = refs[pos : pos + 2]
        return kernel(
            seed_ref, alibi_ref, q_ref, k_ref, v_ref, do_ref,
            do_lo_ref, lse_ref, delta_ref, bias_ref,
            dk_ref, dv_ref, ds_ref, dk_scr, dv_scr, **kw
        )

    return wrapped


def _adapt_dq(kernel, has_bias: bool, emit_dbias: bool, has_alibi: bool = False):
    """Map the actual pallas ref list to the full _dq_kernel signature."""

    @functools.wraps(kernel)
    def wrapped(*refs, **kw):
        refs = list(refs)
        pos = 0
        seed_ref = refs[pos]
        pos += 1
        alibi_ref = refs[pos] if has_alibi else None
        if has_alibi:
            pos += 1
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[pos : pos + 6]
        pos += 6
        bias_ref = refs[pos] if has_bias else None
        if has_bias:
            pos += 1
        dq_ref = refs[pos]
        pos += 1
        dbias_ref = refs[pos] if emit_dbias else None
        if emit_dbias:
            pos += 1
        dq_scr = refs[pos]
        return kernel(
            seed_ref, alibi_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
            delta_ref, bias_ref, dq_ref, dbias_ref, dq_scr, **kw
        )

    return wrapped
