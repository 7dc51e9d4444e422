"""fp32-accumulated reference attention — the test oracle.

Pure-JAX (XLA-compiled) exact attention with every FFPA feature: tail-aligned
causal masking, additive/boolean masks, GQA/MQA head grouping, deterministic
dropout (shared hash with the Pallas kernels), cross-attention, and LSE
output. This is the numerics contract: Pallas kernels must match this within
fp16 1e-2 / bf16 5e-2 (reference contract: tests/test_ffpa_bwd.py:38-46).

It doubles as the ``SDPABackend`` compute path for fallback shapes, mirroring
the reference's delegation to ``torch._C._nn.scaled_dot_product_attention``
(reference: src/ffpa_attn/ffpa_attn_interface.py:157-168) — except that on
TPU the "native SDPA" is simply XLA fusing this einsum chain.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .rng import dropout_keep_mask, make_row_col_ids

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def expand_kv_heads(kv: jnp.ndarray, num_q_heads: int) -> jnp.ndarray:
    """Expand [B, Hkv, N, D] -> [B, Hq, N, D] by repeating each group."""
    b, hkv, n, d = kv.shape
    group = num_q_heads // hkv
    if group == 1:
        return kv
    kv = jnp.broadcast_to(kv[:, :, None], (b, hkv, group, n, d))
    return kv.reshape(b, num_q_heads, n, d)


def reduce_q_heads(grad: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """Reduce [B, Hq, N, D] grads back to [B, Hkv, N, D] by group-sum.

    The reference does the same expand/reduce for GQA backward
    (triton/_ffpa_bwd.py:2936-2990).
    """
    b, hq, n, d = grad.shape
    group = hq // num_kv_heads
    if group == 1:
        return grad
    return grad.reshape(b, num_kv_heads, group, n, d).sum(axis=2)


def tail_aligned_causal_mask(nq: int, nkv: int) -> jnp.ndarray:
    """Boolean [nq, nkv] mask: row m attends cols <= m + (nkv - nq).

    Queries are aligned to the tail of the KV sequence (reference:
    ffpa_attn_interface.py:124-128); requires nkv >= nq.
    """
    rows, cols = make_row_col_ids(nq, nkv)
    return cols <= rows + (nkv - nq)


def reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    is_causal: bool = False,
    scale: Optional[float] = None,
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    return_lse: bool = False,
    softcap: float = 0.0,
    window: tuple = (-1, -1),
    alibi_slopes: Optional[jnp.ndarray] = None,
    sinks: Optional[jnp.ndarray] = None,
):
    """Exact attention with fp32 accumulation.

    Args:
      q: [B, Hq, Nq, D]
      k, v: [B, Hq, Nkv, D] (GQA expansion must already have happened —
        callers use :func:`expand_kv_heads`). ``v`` may have a different last
        dim Dv.
      bias: additive fp bias broadcastable to [B, Hq, Nq, Nkv] or None.
      is_causal: tail-aligned causal masking.
      scale: defaults to 1/sqrt(D).
      dropout_p: attention dropout probability in [0, 1).
      dropout_seed: int32 seed for the deterministic keep-mask hash.
      return_lse: also return natural-log LSE [B, Hq, Nq] fp32.
      softcap: logit soft-capping ``s = cap * tanh(s / cap)`` applied to the
        scaled scores BEFORE bias/alibi and masking (0 = off). Semantics of
        FlashAttention's ``softcap`` / splash-attention's ``logits_soft_cap``
        — the kwarg the reference rejects (cute/__init__.py:65-125).
      window: ``(left, right)`` sliding-window bounds around the
        tail-aligned diagonal: row m (position p = m + Nkv - Nq) attends
        cols in ``[p - left, p + right]``; -1 = unbounded. ``is_causal``
        composes as right = 0 (FlashAttention ``window_size`` semantics).
      alibi_slopes: per-head fp32 slopes ``[Hq]`` or ``[B, Hq]``; adds
        ``-slope * |p - col|`` to the scores (non-differentiable).
      sinks: per-head learnable attention-sink logits ``[Hq]`` fp32
        (gpt-oss-style): each row's softmax denominator gains
        ``exp(sink_h)`` mass that attends no value — probabilities sum to
        < 1, damping attention when nothing matches. DIFFERENTIABLE.

    Returns:
      out [B, Hq, Nq, Dv] in q.dtype (and lse if requested).
    """
    b_, hq, nq, d = q.shape
    nkv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * jnp.float32(scale)
    if softcap and softcap > 0.0:
        cap = jnp.float32(softcap)
        s = cap * jnp.tanh(s / cap)
    offset = nkv - nq
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (b_, hq))
        rows, cols = make_row_col_ids(nq, nkv)
        dist = jnp.abs(rows + offset - cols).astype(jnp.float32)
        s = s - slopes[:, :, None, None] * dist[None, None]
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    wl, wr = int(window[0]), int(window[1])
    if is_causal:
        wr = 0
    if wr >= 0 or wl >= 0:
        rows, cols = make_row_col_ids(nq, nkv)
        band = jnp.ones((nq, nkv), bool)
        if wr >= 0:
            band = band & (cols <= rows + offset + wr)
        if wl >= 0:
            band = band & (cols >= rows + offset - wl)
        s = jnp.where(band[None, None], s, DEFAULT_MASK_VALUE)

    m = jnp.max(s, axis=-1, keepdims=True)
    if sinks is not None:
        sink_col = jnp.asarray(sinks, jnp.float32)[None, :, None, None]
        m = jnp.maximum(m, sink_col)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if sinks is not None:
        l = l + jnp.exp(sink_col - m)
    lse = (m + jnp.log(l))[..., 0]

    p = p / jnp.where(l == 0.0, 1.0, l)

    if dropout_p > 0.0:
        rows, cols = make_row_col_ids(nq, nkv)
        # Vectorize the keep mask over (batch, head) with broadcasting on the
        # scalar combine: build per-(b, h) masks via vmap to keep the hash
        # identical to the per-block kernel computation.
        def _mask_for(bi, hi):
            return dropout_keep_mask(dropout_seed, bi, hi, rows, cols, dropout_p)

        bh_masks = jax.vmap(
            lambda bi: jax.vmap(lambda hi: _mask_for(bi, hi))(jnp.arange(hq))
        )(jnp.arange(b_))
        p = jnp.where(bh_masks, p, 0.0) / jnp.float32(1.0 - dropout_p)

    out = jnp.einsum("bhqk,bhkd->bhqd", p, vf).astype(q.dtype)
    if return_lse:
        return out, lse
    return out
