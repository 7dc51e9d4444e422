"""FFPA attention core op: jit/grad/vmap-composable custom_vjp.

The analog of the reference autograd boundary ``_FFPAAttnFunc``
(reference: src/ffpa_attn/functional.py:845-1104) — but where the reference
needs ``torch.library`` ops plus ``@torch._dynamo.disable`` to survive
torch.compile, JAX gets this for free: the op is a ``jax.custom_vjp`` whose
forward saves (q, k, v, bias, o, lse, seed) residuals (functional.py:954-965)
and whose backward routes by backend:

* ``PallasBackend`` -> the split-launch Pallas kernels (flash_bwd.py)
* ``SDPABackend``  -> fp32 recompute via ``jax.vjp`` of the reference
  einsum chain (the analog of aten efficient-attention backward,
  reference aten/_efficient_bwd.py:50)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..functional import AttentionMeta, PallasBackend, SDPABackend
from .config import BlockConfig
from .flash_bwd import flash_attention_backward
from .flash_fwd import flash_attention_forward
from .reference import expand_kv_heads, reduce_q_heads, reference_attention


@dataclass(frozen=True)
class StaticArgs:
    """Hashable static kernel parameters for custom_vjp nondiff_argnums."""

    scale: float
    is_causal: bool
    dropout_p: float
    fwd_config: Optional[BlockConfig]
    bwd_config: Optional[BlockConfig]
    backward_is_sdpa: bool
    grad_kv_storage_dtype: Optional[str]
    grad_q_storage_dtype: Optional[str]
    ds_handoff: Optional[bool] = None
    save_scores: Optional[bool] = None
    # Hi+lo-split P for the dV matmul (float16-origin inputs: the 1e-2
    # contract needs finer P rounding than bf16 gives; flash_bwd.py).
    precise_pv: bool = False
    # Logit soft-capping cap*tanh(s/cap) (0 = off) and sliding-window
    # (left, right) band (-1 = unbounded) — features the reference rejects
    # (cute/__init__.py:65-125), implemented TPU-natively here.
    softcap: float = 0.0
    window: tuple = (-1, -1)
    # Whether an alibi_slopes tensor rides along (the tensor itself is a
    # traced argument of the core op, not a static).
    has_alibi: bool = False


def _to_compute_dtype(q, k, v):
    """Mosaic has no f16: f16 inputs compute in bf16 (fp32 accumulation
    either way). The cast happens INSIDE the custom_vjp so the backward
    receives the unrounded f16 cotangent (fp16 1e-2 contract)."""
    if q.dtype == jnp.float16:
        return (
            q.astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            True,
        )
    return q, k, v, False


def apply_sinks(o, lse, sinks, head_axis: int = 1):
    """Fold per-head sink logits into the softmax normalizer.

    The kernels compute the sink-free softmax (o, lse); the exact
    sink-inclusive result is a pure rescale — ``lse' = logaddexp(lse,
    sink)``, ``o' = o * exp(lse - lse')`` — because the sink adds
    denominator mass but no value row. The BACKWARD kernels then run
    UNCHANGED on (o', lse'): with p = exp(s - lse'), the standard
    ``ds = p * (dp - rowsum(dO*O))`` identity already accounts for the
    sink's normalizer share (the sink's own dp is zero — it attends no
    value), and ``dsink`` falls out in closed form (:func:`sink_grad`).

    ``head_axis`` locates the head dim of ``lse`` (1 for the dense
    [B, H, N] layout, 0 for varlen's head-major [H, T])."""
    shape = [1] * lse.ndim
    shape[head_axis] = -1
    sink_col = sinks.astype(jnp.float32).reshape(shape)
    lse_s = jnp.logaddexp(lse, sink_col)
    o_s = (o.astype(jnp.float32) * jnp.exp(lse - lse_s)[..., None]).astype(o.dtype)
    return o_s, lse_s


def sink_grad(do, o, lse, sinks, head_axis: int = 1):
    """Closed-form sink gradient from the sink-inclusive residuals:
    ``dsink_h = -sum exp(sink_h - lse') * rowsum(dO * O)`` over every
    non-head axis."""
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    shape = [1] * lse.ndim
    shape[head_axis] = -1
    p_sink = jnp.exp(sinks.astype(jnp.float32).reshape(shape) - lse)
    axes = tuple(ax for ax in range(lse.ndim) if ax != head_axis)
    return (-jnp.sum(p_sink * delta, axis=axes)).astype(sinks.dtype)



@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def ffpa_attention_core(static: StaticArgs, q, k, v, bias, alibi, sinks, seed):
    q, k, v, was_f16 = _to_compute_dtype(q, k, v)
    o, lse = flash_attention_forward(
        q,
        k,
        v,
        bias,
        scale=static.scale,
        is_causal=static.is_causal,
        dropout_p=static.dropout_p,
        dropout_seed=seed,
        config=static.fwd_config,
        softcap=static.softcap,
        window=static.window,
        alibi_slopes=alibi,
        f16_boundary=was_f16,
    )
    if sinks is not None:
        o, _ = apply_sinks(o, lse, sinks)
    return o.astype(jnp.float16) if was_f16 else o


def _window_active(static: StaticArgs) -> bool:
    wl, wr = static.window
    return wl >= 0 or (not static.is_causal and wr >= 0)


def _resident_head_count(static: StaticArgs, q, k, v, bias) -> int:
    """S-residency policy, head-granular. Returns m in {0, group, .., Hq}:
    the forward emits the bf16 score residual for the FIRST m query heads
    (a whole number of GQA groups), buying the 4-matmul from-S backward
    for those heads; the remaining heads run the striped dS-handoff
    recompute backward. m == Hq is classic full S-residency; at long
    sequence (e.g. N=16K, where the full residual is 17 GiB against 16 GiB
    of HBM) a partial m keeps as much of the recompute saving as the HBM
    budget allows — per-head slices need NO kernel changes because the
    head axis is a pure grid dimension in every kernel.

    Auto mode requires bf16 inputs — for fp16 the extra bf16 rounding of S
    would erode the 1e-2 parity contract — and PARTIAL residency requires
    dropout_p == 0 (the rest-launch's dropout hash would see shifted head
    ids; full residency replays dropout fine)."""
    hq = q.shape[1]
    group = hq // k.shape[1]
    if static.backward_is_sdpa:
        return 0
    if _window_active(static):
        # Out-of-band S tiles are never written; the band-skipping
        # recompute backward is the right scheme for windows anyway.
        return 0
    if static.softcap > 0.0 and (bias is not None or static.has_alibi):
        # The from-S tanh chain factor is recoverable only when the saved
        # S carries no additive terms.
        return 0
    if static.save_scores is not None:
        if static.save_scores and q.dtype == jnp.float16:
            # The from-S kernel stores S in bf16 and has no do_lo input, so
            # forcing S-residency for fp16 primals would silently drop the
            # hi+lo precision machinery the 1e-2 contract relies on.
            from ..logger import init_logger

            init_logger(__name__).warning_once(
                "save_scores=True ignored for float16 inputs: the bf16 S "
                "residual would erode the fp16 1e-2 gradient contract; "
                "using the dS-handoff backward instead."
            )
            return 0
        return hq if static.save_scores else 0
    if q.dtype != jnp.bfloat16:
        return 0
    from ..env import ENV

    limit = ENV.scores_residual_limit_bytes()
    if limit <= 0:
        return 0
    b, hq, nq, d = q.shape
    nkv = k.shape[2]
    # Exact padded footprint: resolve the same config the forward will use.
    from .config import cdiv
    from .dispatch import pick_forward_config
    from .flash_fwd import _fit_fwd_for_scores

    cfg = static.fwd_config
    if cfg is None:
        cfg = pick_forward_config(
            d=d, dv=v.shape[-1], nq=nq, nkv=nkv, dtype=q.dtype,
            causal=static.is_causal, has_bias=bias is not None,
            dropout=static.dropout_p > 0.0, gqa=group > 1,
            group=group if group > 1 else 0,
        )
    cfg = cfg.clamp(nq, nkv)
    cfg = _fit_fwd_for_scores(cfg, d, v.shape[-1], q.dtype, bias is not None)
    nq_pad = cdiv(nq, cfg.block_q) * cfg.block_q
    nkv_pad = cdiv(nkv, cfg.block_kv) * cfg.block_kv
    per_head_bytes = b * nq_pad * nkv_pad * 2
    # Residency check against real HBM: the residual lives alongside this
    # call's tensors (q/k/v/o/do/grads ~ 8 q-sized arrays + 2 kv-sized)
    # plus the model-margin (aliased dS means S is the ONLY extra N^2).
    # AUTO mode assumes ENV.scores_auto_assumed_layers identical attention
    # calls keep their residual live simultaneously (a stacked model
    # without per-layer remat): one call's gate cannot see whole-program
    # residency, so it budgets for several of itself. Explicit
    # save_scores=True (or layer-level jax.checkpoint) bypasses this.
    layers = max(1, ENV.scores_auto_assumed_layers())
    residents = 2 * (5 * q.size + 4 * k.size)
    headroom = ENV.hbm_bytes() - residents - ENV.hbm_model_margin_bytes()
    budget = min(limit, max(headroom, 0) // layers)
    m = min(hq, int(budget // per_head_bytes))
    if m < hq:
        # Partial residency: the non-resident heads' backward still needs
        # HBM for its dS-handoff stripe slabs WHILE the S slab is live —
        # reserve a coarse-slab's worth so the stripe loop doesn't
        # degenerate into many tiny stripes (flash_bwd.py's auto gate also
        # sees the slab via extra_resident_bytes and adapts regardless).
        reserve = min(
            ENV.ds_handoff_limit_bytes(),
            3 * 1024 * 1024 * 1024 // 2,
            budget // 4,
        )
        m = min(hq, int(max(0, budget - reserve) // per_head_bytes))
    m = (m // group) * group  # whole GQA groups only
    if m < hq and static.dropout_p > 0.0:
        return 0
    return m


def _should_save_scores(static: StaticArgs, q, k, v, bias) -> bool:
    """True iff FULL S-residency applies (autotune tunes this path)."""
    return _resident_head_count(static, q, k, v, bias) == q.shape[1]


def _slice_bias_heads(bias, lo, hi):
    if bias is None or bias.shape[1] == 1:
        return bias
    return bias[:, lo:hi]


def _core_fwd(static: StaticArgs, q, k, v, bias, alibi, sinks, seed):
    m = _resident_head_count(static, q, k, v, bias)
    hq = q.shape[1]
    group = hq // k.shape[1]
    q, k, v, was_f16 = _to_compute_dtype(q, k, v)
    fwd = functools.partial(
        flash_attention_forward,
        scale=static.scale,
        is_causal=static.is_causal,
        dropout_p=static.dropout_p,
        dropout_seed=seed,
        config=static.fwd_config,
        softcap=static.softcap,
        window=static.window,
        f16_boundary=was_f16,
    )
    if 0 < m < hq:
        # Partial head residency: heads [0, m) emit S, the rest don't. Two
        # launches over disjoint head ranges cost no extra traffic (K/V
        # stream per-head anyway) and no kernel changes (head axis is a
        # pure grid dim).
        mk = m // group
        o1, lse1, scores = fwd(
            q[:, :m], k[:, :mk], v[:, :mk],
            _slice_bias_heads(bias, 0, m), return_scores=True,
            alibi_slopes=_slice_alibi_heads(alibi, 0, m),
        )
        o2, lse2 = fwd(
            q[:, m:], k[:, mk:], v[:, mk:], _slice_bias_heads(bias, m, hq),
            alibi_slopes=_slice_alibi_heads(alibi, m, hq),
        )
        o = jnp.concatenate([o1, o2], axis=1)
        lse = jnp.concatenate([lse1, lse2], axis=1)
    elif m == hq:
        o, lse, scores = fwd(
            q, k, v, bias, return_scores=True, alibi_slopes=alibi
        )
    else:
        (o, lse), scores = fwd(q, k, v, bias, alibi_slopes=alibi), None
    if sinks is not None:
        # Residuals carry the SINK-INCLUSIVE (o, lse): every backward
        # scheme (recompute, dS-handoff, from-S) is already exact under
        # them — see apply_sinks.
        o, lse = apply_sinks(o, lse, sinks)
    out = o.astype(jnp.float16) if was_f16 else o
    return out, (q, k, v, bias, alibi, sinks, o, lse, seed, scores)


def _slice_alibi_heads(alibi, lo, hi):
    if alibi is None:
        return None
    return alibi[..., lo:hi]


def _core_bwd(static: StaticArgs, residuals, do):
    # Residual q/k/v are in COMPUTE dtype (bf16); ``do`` arrives in the
    # PRIMAL dtype — unrounded f16 for fp16 users, which the backward's
    # hi+lo dO split needs (flash_bwd._dv_accumulate).
    q, k, v, bias, alibi, sinks, o, lse, seed, scores = residuals
    was_f16 = do.dtype == jnp.float16
    dsinks = None
    if static.backward_is_sdpa:
        # fp32 recompute path: numerically the reference oracle's own vjp.
        # jax.vjp differentiates through expand_kv_heads, so dk/dv come back
        # already group-reduced to [B, Hkv, Nkv, D].
        hq = q.shape[1]

        def _ref(q_, k_, v_, bias_, sinks_):
            return reference_attention(
                q_,
                expand_kv_heads(k_, hq),
                expand_kv_heads(v_, hq),
                bias_,
                is_causal=static.is_causal,
                scale=static.scale,
                dropout_p=static.dropout_p,
                dropout_seed=seed,
                softcap=static.softcap,
                window=static.window,
                alibi_slopes=alibi,
                sinks=sinks_,
            )

        if sinks is None:
            _, vjp = jax.vjp(lambda a, b, c, d: _ref(a, b, c, d, None), q, k, v, bias)
            dq, dk, dv, dbias = vjp(do.astype(o.dtype))
        else:
            _, vjp = jax.vjp(_ref, q, k, v, bias, sinks)
            dq, dk, dv, dbias, dsinks = vjp(do.astype(o.dtype))
        dk = dk.astype(k.dtype)
        dv = dv.astype(v.dtype)
    else:
        bwd = functools.partial(
            flash_attention_backward,
            scale=static.scale,
            is_causal=static.is_causal,
            dropout_p=static.dropout_p,
            dropout_seed=seed,
            config=static.bwd_config,
            grad_kv_storage_dtype=static.grad_kv_storage_dtype,
            grad_q_storage_dtype=static.grad_q_storage_dtype,
            ds_handoff=static.ds_handoff,
            precise_pv=static.precise_pv,
            softcap=static.softcap,
            window=static.window,
        )
        hq = q.shape[1]
        if scores is not None and scores.shape[1] < hq:
            # Partial head residency (see _resident_head_count): from-S
            # 4-matmul backward for heads [0, m), striped dS-handoff
            # recompute for the rest.
            m = scores.shape[1]
            mk = m * k.shape[1] // hq
            dq1, dk1, dv1, db1 = bwd(
                q[:, :m], k[:, :mk], v[:, :mk],
                _slice_bias_heads(bias, 0, m),
                o[:, :m], lse[:, :m], do[:, :m], scores=scores,
                alibi_slopes=_slice_alibi_heads(alibi, 0, m),
            )
            dq2, dk2, dv2, db2 = bwd(
                q[:, m:], k[:, mk:], v[:, mk:],
                _slice_bias_heads(bias, m, hq),
                o[:, m:], lse[:, m:], do[:, m:], scores=None,
                alibi_slopes=_slice_alibi_heads(alibi, m, hq),
                # The resident S slab is live while this half runs; its
                # bytes must come out of the dS-handoff slab headroom.
                extra_resident_bytes=scores.size * scores.dtype.itemsize,
            )
            dq = jnp.concatenate([dq1, dq2], axis=1)
            dk = jnp.concatenate([dk1, dk2], axis=1)
            dv = jnp.concatenate([dv1, dv2], axis=1)
            dbias = None
            if bias is not None:
                if bias.shape[1] == 1:
                    dbias = (
                        db1.astype(jnp.float32) + db2.astype(jnp.float32)
                    ).astype(bias.dtype)
                else:
                    dbias = jnp.concatenate([db1, db2], axis=1)
        else:
            dq, dk, dv, dbias = bwd(
                q, k, v, bias, o, lse, do, scores=scores, alibi_slopes=alibi
            )
        if sinks is not None:
            # Closed form from the residuals, no kernel involvement.
            dsinks = sink_grad(do, o, lse, sinks)
    if was_f16:
        # Cotangents return in the primal's f16 unless an explicit grad
        # storage dtype was requested.
        if static.grad_q_storage_dtype is None and dq is not None:
            dq = dq.astype(jnp.float16)
        if static.grad_kv_storage_dtype is None:
            dk = dk.astype(jnp.float16)
            dv = dv.astype(jnp.float16)
    # ALiBi slopes are positional hyperparameters, not weights: zero grad.
    dalibi = None if alibi is None else jnp.zeros_like(alibi)
    return dq, dk, dv, dbias, dalibi, dsinks, None


ffpa_attention_core.defvjp(_core_fwd, _core_bwd)


_AUTOTUNE_CACHE: dict = {}


def _online_autotune(direction, q, k, v, bias, meta, mode):
    """Per-call timed search (reference ``autotune=True``,
    TritonBackend/functional.py:291-335). Runs eagerly on concrete arrays
    and memoizes by variant key; under jit tracing no timing is possible,
    so fall back to the persistent-store/heuristic path with a one-time
    warning (the reference's torch-op launch is always eager; JAX is not).
    """
    import jax.core

    from ..logger import init_logger

    logger = init_logger(__name__)
    if any(isinstance(t, jax.core.Tracer) for t in (q, k, v)):
        logger.warning_once(
            "autotune=True inside jit tracing: cannot time candidates; "
            "using persistent-store/heuristic config. Run the call once "
            "eagerly (or `python -m ffpa_attn_tpu.autotune`) to tune."
        )
        return None
    key = (
        direction, q.shape, k.shape, v.shape, str(q.dtype),
        None if bias is None else bias.shape,
        meta.is_causal, meta.dropout_p > 0.0, mode,
    )
    if key in _AUTOTUNE_CACHE:
        return _AUTOTUNE_CACHE[key]
    from ..autotune.search import autotune_backward, autotune_forward

    tune = autotune_forward if direction == "fwd" else autotune_backward
    cfg, _ = tune(
        q, k, v, bias, scale=meta.scale, is_causal=meta.is_causal,
        dropout_p=meta.dropout_p, mode=mode,
    )
    _AUTOTUNE_CACHE[key] = cfg
    return cfg


def apply_attention(
    meta: AttentionMeta,
    q,
    k,
    v,
    bias,
    dropout_seed=0,
    precise_pv: bool = False,
    alibi_slopes=None,
    sinks=None,
):
    """Dispatch a normalized attention call to the core op.

    Mirrors `_FFPAAttnFunc.forward` routing (functional.py:863-967) minus
    the GPU backend zoo: decode shapes route to the split-KV kernel, the
    rest to the dense Pallas kernel via custom_vjp.
    """
    fwd_be = meta.forward_backend
    bwd_be = meta.backward_backend
    softcap = float(getattr(meta, "softcap", 0.0) or 0.0)
    window = tuple(getattr(meta, "window", (-1, -1)))
    alibi = None
    if alibi_slopes is not None:
        alibi = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi.ndim == 1:
            alibi = jnp.broadcast_to(alibi[None], (q.shape[0], q.shape[1]))
    if sinks is not None:
        sinks = jnp.asarray(sinks, jnp.float32)

    nq = q.shape[2]
    if nq <= 8 and meta.dropout_p == 0.0 and alibi is None:
        # Decode fast path — covers speculative decoding (Nq 2..8) as well
        # as plain Nq=1 (the kernel pads Q to one 16-row sublane tile
        # either way), including softcap and sliding windows (the window's
        # KV index clamp makes long-cache windowed decode O(W), the
        # Mistral/Gemma serving shape). GQA grads route through the grouped
        # fp32 composite vjp (ops/decode.py:_decode_core_bwd), falling
        # back to the tiled kernels above a score-size cutoff. ALiBi
        # decode takes the dense kernel.
        from .decode import (
            _DECODE_BWD_COMPOSITE_MAX_ELEMS,
            decode_attention,
            decode_attention_supported,
        )

        if decode_attention_supported(q, k):
            qb, kb, vb, was_f16 = _to_compute_dtype(q, k, v)
            if (
                q.shape[1] == k.shape[1]
                and q.size * k.shape[2] // q.shape[3]
                <= _DECODE_BWD_COMPOSITE_MAX_ELEMS
            ):
                # MHA decode: with no PackGQA fold the kernel has no
                # bandwidth edge over the XLA composite (both stream K/V
                # once: 0.72 vs 0.71 ms at the bench shape), while under
                # jax.grad the composite lets XLA share the fwd's softmax
                # residuals with the backward — the same residual sharing
                # the SDPA baseline gets — instead of paying a custom_vjp
                # recompute program (measured: grad 2.34 vs 2.74 ms).
                # GQA keeps the kernel: the fold is a group-x traffic win
                # both directions (6.3x fwd / 4-6x bwd benched).
                out = reference_attention(
                    qb, kb, vb, bias,
                    is_causal=meta.is_causal,
                    scale=meta.scale,
                    softcap=softcap,
                    window=window,
                    sinks=sinks,
                )
                return out.astype(jnp.float16) if was_f16 else out
            out = decode_attention(
                qb,
                kb,
                vb,
                bias,
                scale=meta.scale,
                is_causal=meta.is_causal,
                softcap=softcap,
                window=window,
                sinks=sinks,
            )
            return out.astype(jnp.float16) if was_f16 else out

    fwd_config = None
    if isinstance(fwd_be, PallasBackend):
        if fwd_be.block_q is not None or fwd_be.block_kv is not None:
            base = BlockConfig()
            fwd_config = BlockConfig(
                block_q=fwd_be.block_q or base.block_q,
                block_kv=fwd_be.block_kv or base.block_kv,
            )
        elif fwd_be.autotune:
            fwd_config = _online_autotune(
                "fwd", q, k, v, bias, meta, fwd_be.autotune_mode
            )
    bwd_config = None
    grad_kv_dtype = None
    grad_q_dtype = None
    ds_handoff = None
    save_scores = None
    if isinstance(bwd_be, PallasBackend):
        ds_handoff = bwd_be.ds_handoff
        save_scores = bwd_be.save_scores
        if bwd_be.block_kv_dkdv is not None or bwd_be.block_q_dq is not None:
            base = BlockConfig()
            bwd_config = BlockConfig(
                block_kv_dkdv=bwd_be.block_kv_dkdv or base.block_kv_dkdv,
                block_q_dq=bwd_be.block_q_dq or base.block_q_dq,
            )
        elif bwd_be.autotune:
            bwd_config = _online_autotune(
                "bwd", q, k, v, bias, meta, bwd_be.autotune_mode
            )
        grad_kv_dtype = bwd_be.grad_kv_storage_dtype
        grad_q_dtype = bwd_be.grad_q_storage_dtype

    static = StaticArgs(
        scale=meta.scale,
        is_causal=meta.is_causal,
        dropout_p=meta.dropout_p,
        fwd_config=fwd_config,
        bwd_config=bwd_config,
        backward_is_sdpa=isinstance(bwd_be, SDPABackend),
        grad_kv_storage_dtype=grad_kv_dtype,
        grad_q_storage_dtype=grad_q_dtype,
        ds_handoff=ds_handoff,
        save_scores=save_scores,
        precise_pv=precise_pv,
        softcap=softcap,
        window=window,
        has_alibi=alibi is not None,
    )
    return ffpa_attention_core(static, q, k, v, bias, alibi, sinks, dropout_seed)
