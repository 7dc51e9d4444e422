"""Pallas TPU forward kernel for FFPA large-head-dim exact attention.

TPU-first re-design of the reference forward family (reference:
src/ffpa_attn/triton/_ffpa_fwd.py:302-495 and cute/_fwd_generic_sm80.py).
Structure:

* grid ``(B, Hq, Nq/block_q, Nkv/block_kv)`` — one grid cell owns a
  (block_q x D) Q tile (kept VMEM-resident across the KV axis, which is the
  innermost "arbitrary" dimension) and streams (block_kv x D) K/V tiles.
  Pallas/Mosaic double-buffers the K/V HBM->VMEM copies across grid steps,
  the TPU analog of the reference's cp.async multi-stage pipelines.
* fp32 online softmax with running (m, l) statistics in VMEM scratch and a
  fp32 (block_q x Dv) output accumulator — the reference's
  ``o_accs[j] = alpha*o_accs[j] + P@V_j`` V-group scheme
  (triton/_ffpa_fwd.py:474-482) collapses to a single fp32 accumulator
  because VMEM (~16 MiB) comfortably holds block_q x 1024 fp32.
* The reference's *Split-D* trick (stream K/V in head-dim chunks for O(1)
  SRAM) maps to VMEM block shaping: D up to 1024 fits whole, so the tunable
  surface is (block_q, block_kv) rather than d-chunks; the VMEM cost model
  in ``config.py`` plays the role of ``can_implement``.
* GQA in-kernel head mapping via the K/V BlockSpec index map
  (``h // group``) — the analog of ``off_hkv = off_hq // group_size``
  (triton/_ffpa_fwd.py:375-376).
* Additive bias with broadcast dims kept compact via size-1 block dims —
  the analog of stride-0 broadcast strides (triton/_ffpa_fwd.py:41-69).
* Tail-aligned causal masking with whole-tile skipping.
* Deterministic dropout via the layout-independent hash in ``rng.py``,
  replayed bit-identically in backward.

Outputs: ``o [B, Hq, Nq, Dv]`` in input dtype and natural-log
``lse [B, Hq, Nq]`` fp32 (reference epilogue ``LSE = m + log(l)``,
triton/_ffpa_fwd.py:487-495).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import LANE, BlockConfig, cdiv, fwd_vmem_bytes
from .reference import DEFAULT_MASK_VALUE
from .rng import dropout_keep_mask

_INTERPRET_CACHE: Optional[bool] = None


def use_interpret() -> bool:
    """Interpret Pallas kernels off-TPU (CPU test meshes)."""
    global _INTERPRET_CACHE
    from ..env import ENV

    if ENV.force_interpret():
        return True
    if _INTERPRET_CACHE is None:
        try:
            _INTERPRET_CACHE = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:
            _INTERPRET_CACHE = True
    return _INTERPRET_CACHE


def _pad_dim(x: jnp.ndarray, axis: int, to: int) -> jnp.ndarray:
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(
    seed_ref,  # SMEM (1, 1) int32
    alibi_ref,  # SMEM (B, Hq) f32 or absent
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_kv, D)
    v_ref,  # (1, 1, block_kv, Dv)
    bias_ref,  # (1, 1, bq|1, bkv|1) or absent
    o_ref,  # (1, 1, block_q, Dv)
    lse_ref,  # (1, 1, 1, block_q) — LSE stored [B, H, 1, Nq] (legal block)
    s_ref,  # optional (1, 1, block_q, block_kv) — S-residual emission
    m_scr,  # VMEM (block_q, LANE) f32
    l_scr,  # VMEM (block_q, LANE) f32
    acc_scr,  # VMEM (block_q, Dv) f32
    *,
    scale: float,
    causal: bool,
    causal_offset: int,
    true_nkv: int,
    kv_padded: bool,
    dropout_p: float,
    num_kv_blocks: int,
    has_bias: bool,
    emit_scores: bool = False,
    softcap: float = 0.0,
    window_left: int = -1,
    window_right: int = -1,
    has_alibi: bool = False,
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)

    block_q = q_ref.shape[2]
    block_kv = k_ref.shape[2]

    # Device-log lane (env.py device_log_level): a trace-time gate, so at
    # level < 2 no callsite enters the jaxpr and the compiled kernel is
    # identical to logging-off (the const_expr elimination of the
    # reference's fa_logging.py:10-25).
    from ..env import ENV

    _dbg = ENV.device_log_level()

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Band tile skipping. Causal is window_right == 0; an explicit sliding
    # window additionally bounds columns below (the lever that makes window
    # attention O(N*W): out-of-band tiles skip compute AND, via the clamped
    # kv index map, their DMAs).
    wr_eff = 0 if causal else window_right
    should_run = True
    if causal or window_right >= 0:
        # First col of tile j must be <= last row of tile i + offset + wr.
        should_run = j * block_kv <= (i + 1) * block_q - 1 + causal_offset + wr_eff
    if window_left >= 0:
        # Last col of tile j must be >= first row of tile i + offset - wl.
        should_run = jnp.logical_and(
            should_run,
            (j + 1) * block_kv - 1 >= i * block_q + causal_offset - window_left,
        )

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * jnp.float32(scale)

        if softcap > 0.0:
            cap = jnp.float32(softcap)
            s = cap * jnp.tanh(s / cap)

        rows = lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + i * block_q
        cols = lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + j * block_kv

        if has_alibi:
            slope = alibi_ref[b_idx, h_idx]
            dist = jnp.abs(rows + causal_offset - cols).astype(jnp.float32)
            s = s - slope * dist

        if has_bias:
            bias = bias_ref[0, 0].astype(jnp.float32)
            s = s + jnp.broadcast_to(bias, s.shape)

        if causal or window_right >= 0:
            s = jnp.where(cols <= rows + causal_offset + wr_eff, s, DEFAULT_MASK_VALUE)
        if window_left >= 0:
            s = jnp.where(
                cols >= rows + causal_offset - window_left, s, DEFAULT_MASK_VALUE
            )
        if kv_padded:
            s = jnp.where(cols < true_nkv, s, DEFAULT_MASK_VALUE)

        if emit_scores:
            # S-residual: the post-scale/bias/mask scores, exactly what the
            # from-S backward exponentiates against the saved LSE.
            s_ref[0, 0] = s.astype(s_ref.dtype)

        m_prev = m_scr[...]  # (block_q, LANE), lanes replicated
        l_prev = l_scr[...]
        m_tile = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_tile)  # broadcast to (block_q, LANE)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, 0:1])  # (block_q, block_kv)
        l_tile = jnp.sum(p, axis=1, keepdims=True)  # (block_q, 1)
        l_next = alpha * l_prev + l_tile
        m_scr[...] = m_next
        l_scr[...] = l_next

        if dropout_p > 0.0:
            # (bq,1) rows x (1,bkv) cols: the row-fold broadcasts, so only
            # the final hash combine is full-tile VPU work (bit-identical
            # to folding full-size grids — values don't vary along the
            # broadcast axis).
            keep = dropout_keep_mask(
                seed_ref[0, 0], b_idx, h_idx, rows[:, :1], cols[:1, :],
                dropout_p,
            )
            p = jnp.where(keep, p, 0.0) * jnp.float32(1.0 / (1.0 - dropout_p))

        v = v_ref[0, 0]
        pv = lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + pv

        if _dbg >= 3:  # all kernel traces: one line per visited KV tile
            # Mosaic debug_print placeholders are int32-only; stats ride
            # as milli-units. Same +-inf/overflow clamp as the level-2
            # epilogue print: a masked-out first row has m at -inf (or
            # DEFAULT_MASK_VALUE, where *1000 overflows f32) and
            # float->int of that is undefined.
            sent3 = jnp.float32(-(2 ** 30))
            pl.debug_print(
                "ffpa-fwd tile b={} h={} qi={} kj={} m0_milli={} l0_milli={}",
                b_idx, h_idx, i, j,
                jnp.clip(m_next[0, 0] * 1000.0, sent3, -sent3).astype(jnp.int32),
                jnp.clip(l_next[0, 0] * 1000.0, sent3, -sent3).astype(jnp.int32),
            )

    # Causal: S blocks above the diagonal are never written — the S out
    # index map clamps to the diagonal, so Mosaic keeps one VMEM buffer per
    # visited slot and masked tiles cost no HBM writes. Consumers
    # (flash_bwd from-S kernel, banded dQ) skip those tiles by the same
    # predicate and never read the uninitialized regions.

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = m_scr[:, 0] + jnp.log(jnp.maximum(l, 1e-38))[:, 0]
        if _dbg >= 2:  # curated: one line per grid cell at its epilogue
            # A fully-masked first row leaves m_scr at -inf; float->int of
            # +-inf is undefined — clamp to a recognizable sentinel so the
            # cells one is usually debugging print -2^30, not garbage.
            sent = jnp.float32(-(2 ** 30))
            pl.debug_print(
                "ffpa-fwd cell b={} h={} qi={} m0_milli={} l0_milli={}",
                b_idx, h_idx, i,
                jnp.clip(m_scr[0, 0] * 1000.0, sent, -sent).astype(jnp.int32),
                jnp.clip(l_scr[0, 0] * 1000.0, sent, -sent).astype(jnp.int32),
            )


def flash_attention_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    scale: float,
    is_causal: bool,
    dropout_p: float = 0.0,
    dropout_seed=0,
    config: Optional[BlockConfig] = None,
    interpret: Optional[bool] = None,
    return_scores: bool = False,
    scores_dtype=jnp.bfloat16,
    softcap: float = 0.0,
    window: tuple = (-1, -1),
    alibi_slopes: Optional[jnp.ndarray] = None,
    f16_boundary: bool = False,
):
    """Launch the forward kernel.

    Args:
      q: [B, Hq, Nq, D]; k: [B, Hkv, Nkv, D]; v: [B, Hkv, Nkv, Dv].
      bias: fp32 additive bias, 4-D broadcast-compact, or None.
      dropout_seed: int or traced int32 scalar.
      return_scores: additionally emit the post-scale/bias/mask score
        matrix S as a ``scores_dtype`` [B, Hq, Nq_pad, Nkv_pad] residual
        (PADDED — the from-S backward consumes the padded layout directly).
        This powers the 4-matmul S-resident backward (flash_bwd.py).
      softcap / window / alibi_slopes: see ``reference_attention`` —
        logit soft-capping, sliding-window band, per-head ALiBi slopes
        ([Hq] or [B, Hq] fp32, read from SMEM in-kernel so no N^2 bias
        tensor is ever materialized).

    Returns:
      (o [B, Hq, Nq, Dv] in q.dtype, lse [B, Hq, Nq] fp32)
      plus the padded S residual when ``return_scores``.
    """
    b, hq, nq, d = q.shape
    _, hkv, nkv, _ = k.shape
    dv = v.shape[-1]
    group = hq // hkv
    window_left = int(window[0])
    window_right = -1 if is_causal else int(window[1])
    if return_scores and (window_left >= 0 or window_right >= 0):
        raise ValueError(
            "return_scores is not supported with sliding windows (out-of-"
            "band S tiles are never written); the caller must gate "
            "save_scores off for windowed attention"
        )

    if config is None:
        from .dispatch import pick_forward_config

        config = pick_forward_config(
            d=d, dv=dv, nq=nq, nkv=nkv, dtype=q.dtype,
            causal=is_causal, has_bias=bias is not None,
            dropout=dropout_p > 0.0, gqa=group > 1,
            group=group if group > 1 else 0,
            # float16 primals compute in bf16; the flag keeps the tuned
            # store query saying float16 (dispatch.pick_forward_config).
            f16=f16_boundary,
        )
    config = config.clamp(nq, nkv)
    if return_scores:
        config = _fit_fwd_for_scores(config, d, dv, q.dtype, bias is not None)
    bq, bkv = config.block_q, config.block_kv

    nq_pad = cdiv(nq, bq) * bq
    nkv_pad = cdiv(nkv, bkv) * bkv
    q_p = _pad_dim(q, 2, nq_pad)
    k_p = _pad_dim(k, 2, nkv_pad)
    v_p = _pad_dim(v, 2, nkv_pad)

    num_q_blocks = nq_pad // bq
    num_kv_blocks = nkv_pad // bkv
    grid = (b, hq, num_q_blocks, num_kv_blocks)

    causal_offset = nkv - nq

    upper_band = is_causal or window_right >= 0
    wr_eff = 0 if is_causal else window_right

    # Clamp the streamed KV block index to the band any row of this Q block
    # attends. Pallas elides the DMA when consecutive grid steps map to the
    # same block, so fully-masked tiles cost neither bandwidth nor compute
    # (the @pl.when skip) — the bandwidth analog of the reference's causal
    # tile skipping, extended below the diagonal for sliding windows.
    def kv_index(b_, h, i, j, g=group):
        jj = j
        if upper_band:
            j_max = jnp.maximum(
                ((i + 1) * bq - 1 + causal_offset + wr_eff) // bkv, 0
            )
            jj = jnp.minimum(jj, j_max)
        if window_left >= 0:
            j_min = jnp.clip(
                (i * bq + causal_offset - window_left) // bkv,
                0,
                num_kv_blocks - 1,
            )
            jj = jnp.maximum(jj, j_min)
        return (b_, h // g, jj, 0)

    has_alibi = alibi_slopes is not None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (b, hq))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,1) int32
    ]
    inputs = [jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)]
    if has_alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (B, Hq) f32
        inputs.append(slopes)
    in_specs += [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec((1, 1, bkv, d), kv_index),
        pl.BlockSpec((1, 1, bkv, dv), kv_index),
    ]
    inputs += [q_p, k_p, v_p]
    has_bias = bias is not None
    if has_bias:
        bias_block = [1, 1, 1, 1]
        if bias.shape[2] != 1:
            bias = _pad_dim(bias, 2, nq_pad)
            bias_block[2] = bq
        if bias.shape[3] != 1:
            bias = _pad_dim(bias, 3, nkv_pad)
            bias_block[3] = bkv

        def bias_index(b_, h, i, j, shape=bias.shape):
            return (
                b_ if shape[0] != 1 else 0,
                h if shape[1] != 1 else 0,
                i if shape[2] != 1 else 0,
                j if shape[3] != 1 else 0,
            )

        in_specs.append(pl.BlockSpec(tuple(bias_block), bias_index))
        inputs.append(bias)

    kernel = functools.partial(
        _adapt_fwd(_fwd_kernel, has_bias, return_scores, has_alibi),
        scale=scale,
        causal=is_causal,
        causal_offset=causal_offset,
        true_nkv=nkv,
        kv_padded=nkv_pad != nkv,
        dropout_p=float(dropout_p),
        num_kv_blocks=num_kv_blocks,
        has_bias=has_bias,
        emit_scores=return_scores,
        softcap=float(softcap),
        window_left=window_left,
        window_right=window_right,
        has_alibi=has_alibi,
    )

    out_shape = [
        jax.ShapeDtypeStruct((b, hq, nq_pad, dv), q.dtype),
        jax.ShapeDtypeStruct((b, hq, 1, nq_pad), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bq, dv), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec((1, 1, 1, bq), lambda b_, h, i, j: (b_, h, 0, i)),
    ]
    if return_scores:
        out_shape.append(
            jax.ShapeDtypeStruct((b, hq, nq_pad, nkv_pad), scores_dtype)
        )
        if is_causal:

            def s_index(b_, h, i, j):
                j_max = ((i + 1) * bq - 1 + causal_offset) // bkv
                return (b_, h, i, jnp.minimum(j, j_max))

            out_specs.append(pl.BlockSpec((1, 1, bq, bkv), s_index))
        else:
            out_specs.append(
                pl.BlockSpec((1, 1, bq, bkv), lambda b_, h, i, j: (b_, h, i, j))
            )
    scratch_shapes = [
        pltpu.VMEM((bq, LANE), jnp.float32),
        pltpu.VMEM((bq, LANE), jnp.float32),
        pltpu.VMEM((bq, dv), jnp.float32),
    ]

    flops = 4 * b * hq * nq * nkv * (d + dv) // 2
    if is_causal:
        flops = flops // 2
    itemsize = jnp.dtype(q.dtype).itemsize
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                q.size + k.size * group + v.size * group + q.size
            )
            * itemsize,
            transcendentals=b * hq * nq * nkv,
        ),
        interpret=use_interpret() if interpret is None else interpret,
    )(*inputs)
    if return_scores:
        o, lse, s_pad = result
    else:
        o, lse = result
        s_pad = None

    lse = lse[:, :, 0, :]
    if nq_pad != nq:
        o = o[:, :, :nq]
        lse = lse[:, :, :nq]
    if return_scores:
        return o, lse, s_pad
    return o, lse


def _fit_fwd_for_scores(config: BlockConfig, d, dv, dtype, has_bias):
    """Shrink forward blocks until the extra S output block fits VMEM."""
    from dataclasses import replace

    from ..env import ENV

    limit = ENV.vmem_limit_bytes()
    itemsize = jnp.dtype(dtype).itemsize
    cfg = config
    while (
        fwd_vmem_bytes(cfg, d, dv, itemsize, has_bias, emit_scores=True)
        > limit
    ):
        bq, bkv = cfg.block_q, cfg.block_kv
        if bq >= 2 * LANE and bq >= bkv:
            cfg = replace(cfg, block_q=bq // 2)
        elif bkv >= 2 * LANE:
            cfg = replace(cfg, block_kv=bkv // 2)
        else:
            break
    return cfg


def _adapt_fwd(kernel, has_bias: bool, emit_scores: bool, has_alibi: bool = False):
    """Map the actual pallas ref list to the full _fwd_kernel signature."""

    @functools.wraps(kernel)
    def wrapped(*refs, **kw):
        refs = list(refs)
        pos = 0
        seed_ref = refs[pos]
        pos += 1
        alibi_ref = refs[pos] if has_alibi else None
        if has_alibi:
            pos += 1
        q_ref, k_ref, v_ref = refs[pos : pos + 3]
        pos += 3
        bias_ref = refs[pos] if has_bias else None
        if has_bias:
            pos += 1
        o_ref, lse_ref = refs[pos : pos + 2]
        pos += 2
        s_ref = refs[pos] if emit_scores else None
        if emit_scores:
            pos += 1
        m, l, acc = refs[pos : pos + 3]
        return kernel(
            seed_ref, alibi_ref, q_ref, k_ref, v_ref, bias_ref,
            o_ref, lse_ref, s_ref, m, l, acc, **kw
        )

    return wrapped
