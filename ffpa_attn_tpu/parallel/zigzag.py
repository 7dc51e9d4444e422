"""Zigzag (load-balanced) causal ring attention.

The naive causal ring (ring.py) masks whole steps: chip ``s`` skips KV
blocks from chips ``> s``, so the LAST chip works every step while chip 0
idles — wall-clock equals the non-causal ring and the causal FLOP saving
is lost. The zigzag layout fixes the balance: the sequence is split into
``2S`` chunks and chip ``s`` owns the PAIR (C_s, C_{2S-1-s}) — one early
chunk + one late chunk — so every chip's total visible work is the same
(2S+1 chunk-pairs each; the classic zigzag schedule from ring-flash
-attention, re-derived for TPU shard_map + ppermute).

Per ring step r (KV pair arriving from chip src = (s-r) mod S):

    Q chunk a = C_s        vs K chunk a' = C_src       : diag r=0 / full src<s
    Q chunk a = C_s        vs K chunk b' = C_{2S-1-src}: never visible
    Q chunk b = C_{2S-1-s} vs K chunk a' = C_src       : always full
    Q chunk b = C_{2S-1-s} vs K chunk b' = C_{2S-1-src}: diag r=0 / full src>s

Inputs/outputs use the NATURAL sequence order; `zigzag_shuffle` /
`zigzag_unshuffle` reorder chunks at the boundary (pure layout ops XLA
fuses into the surrounding sharding).

Backward mirrors ring.py's rotating-accumulator scheme: (dk, dv)
accumulators ride the same ppermute ring home; dq accumulates locally.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_bwd import flash_attention_backward
from ..ops.flash_fwd import flash_attention_forward
from .ring import _merge, _rotate


def _chunk_order(s_count: int) -> np.ndarray:
    """order[2s] = s, order[2s+1] = 2S-1-s — chip s's two chunks."""
    order = np.empty(2 * s_count, np.int32)
    for s in range(s_count):
        order[2 * s] = s
        order[2 * s + 1] = 2 * s_count - 1 - s
    return order


def zigzag_shuffle(x, s_count: int, axis: int = 2):
    """Natural order -> zigzag layout along ``axis``."""
    n = x.shape[axis]
    c = n // (2 * s_count)
    assert n % (2 * s_count) == 0, (n, s_count)
    shape = x.shape[:axis] + (2 * s_count, c) + x.shape[axis + 1 :]
    xc = x.reshape(shape)
    xc = jnp.take(xc, jnp.asarray(_chunk_order(s_count)), axis=axis)
    return xc.reshape(x.shape)


def zigzag_unshuffle(x, s_count: int, axis: int = 2):
    """Zigzag layout -> natural order along ``axis``."""
    n = x.shape[axis]
    c = n // (2 * s_count)
    shape = x.shape[:axis] + (2 * s_count, c) + x.shape[axis + 1 :]
    xc = x.reshape(shape)
    inv = np.argsort(_chunk_order(s_count)).astype(np.int32)
    xc = jnp.take(xc, jnp.asarray(inv), axis=axis)
    return xc.reshape(x.shape)


def _attend(q, k, v, *, scale, causal):
    return flash_attention_forward(q, k, v, None, scale=scale, is_causal=causal)


def _cond_attend(pred, q, k, v, *, scale):
    """Full (non-causal) attention when pred else masked-out partials."""
    b, h, nl, _ = q.shape
    dv = v.shape[-1]

    def _run(args):
        q_, k_, v_ = args
        return _attend(q_, k_, v_, scale=scale, causal=False)

    def _skip(args):
        q_, _, v_ = args
        return (
            jnp.zeros((b, h, nl, dv), q.dtype),
            jnp.full((b, h, nl), -jnp.inf, jnp.float32),
        )

    return lax.cond(pred, _run, _skip, (q, k, v))


def _zigzag_fwd_impl(q, k, v, *, axis_name, axis_size, scale):
    """Per-shard zigzag causal forward. Local layout: [B, H, 2c, D] =
    (chunk C_s, chunk C_{2S-1-s}). Returns (o, (lse_a, lse_b))."""
    s_idx = lax.axis_index(axis_name)
    b, h, n2, _ = q.shape
    c = n2 // 2
    dv = v.shape[-1]

    qa, qb = q[:, :, :c], q[:, :, c:]
    oa = jnp.zeros((b, h, c, dv), jnp.float32)
    la = jnp.full((b, h, c), -jnp.inf, jnp.float32)
    ob = jnp.zeros((b, h, c, dv), jnp.float32)
    lb = jnp.full((b, h, c), -jnp.inf, jnp.float32)

    kv_blk = (k, v)
    for r in range(axis_size):
        if r + 1 < axis_size:
            kv_nxt = (
                _rotate(kv_blk[0], axis_name, axis_size),
                _rotate(kv_blk[1], axis_name, axis_size),
            )
        ka, kb_ = kv_blk[0][:, :, :c], kv_blk[0][:, :, c:]
        va, vb_ = kv_blk[1][:, :, :c], kv_blk[1][:, :, c:]
        src = (s_idx - r) % axis_size

        if r == 0:
            o_s, l_s = _attend(qa, ka, va, scale=scale, causal=True)
            oa, la = _merge(oa, la, o_s, l_s)
            o_s, l_s = _attend(qb, ka, va, scale=scale, causal=False)
            ob, lb = _merge(ob, lb, o_s, l_s)
            o_s, l_s = _attend(qb, kb_, vb_, scale=scale, causal=True)
            ob, lb = _merge(ob, lb, o_s, l_s)
        else:
            o_s, l_s = _cond_attend(src < s_idx, qa, ka, va, scale=scale)
            oa, la = _merge(oa, la, o_s, l_s)
            o_s, l_s = _attend(qb, ka, va, scale=scale, causal=False)
            ob, lb = _merge(ob, lb, o_s, l_s)
            o_s, l_s = _cond_attend(src > s_idx, qb, kb_, vb_, scale=scale)
            ob, lb = _merge(ob, lb, o_s, l_s)

        if r + 1 < axis_size:
            kv_blk = kv_nxt

    o = jnp.concatenate([oa, ob], axis=2).astype(q.dtype)
    return o, (la, lb)


def _zigzag_bwd_impl(q, k, v, o, lse_ab, do, *, axis_name, axis_size, scale):
    """Rotating-accumulator zigzag backward (dk/dv ride the ring home)."""
    s_idx = lax.axis_index(axis_name)
    b, h, n2, d = q.shape
    c = n2 // 2
    la, lb = lse_ab

    qa, qb = q[:, :, :c], q[:, :, c:]
    oa, ob = o[:, :, :c], o[:, :, c:]
    da, db = do[:, :, :c], do[:, :, c:]

    dqa = jnp.zeros(qa.shape, jnp.float32)
    dqb = jnp.zeros(qb.shape, jnp.float32)
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)

    def bwd(q_, k_, v_, o_, l_, do_, causal):
        dq_, dk_, dv_, _ = flash_attention_backward(
            q_, k_, v_, None, o_, l_, do_, scale=scale, is_causal=causal,
            grad_kv_storage_dtype="f32", grad_q_storage_dtype="f32",
        )
        return dq_, dk_, dv_

    def cond_bwd(pred, q_, k_, v_, o_, l_, do_):
        def _run(args):
            return bwd(*args, causal=False)

        def _skip(args):
            q__, k__, v__ = args[0], args[1], args[2]
            return (
                jnp.zeros(q__.shape, jnp.float32),
                jnp.zeros(k__.shape, jnp.float32),
                jnp.zeros(v__.shape, jnp.float32),
            )

        return lax.cond(pred, _run, _skip, (q_, k_, v_, o_, l_, do_))

    kv_blk = (k, v)
    for r in range(axis_size):
        # Prefetch-rotate KV for the next round BEFORE this round's
        # kernels so XLA overlaps the ICI ppermute with the 2.5x-FLOPs
        # backward compute (same fix as ring.py's backward; the
        # accumulator rotation stays below — its only consumer is the
        # `+=` after the NEXT round's kernels, so it overlaps regardless).
        if r + 1 < axis_size:
            kv_nxt = (
                _rotate(kv_blk[0], axis_name, axis_size),
                _rotate(kv_blk[1], axis_name, axis_size),
            )
        ka, kb_ = kv_blk[0][:, :, :c], kv_blk[0][:, :, c:]
        va, vb_ = kv_blk[1][:, :, :c], kv_blk[1][:, :, c:]
        src = (s_idx - r) % axis_size

        if r == 0:
            dq_, dk_, dv_ = bwd(qa, ka, va, oa, la, da, causal=True)
            dqa += dq_
            dka, dva = dk_, dv_
            dq_, dk_, dv_ = bwd(qb, ka, va, ob, lb, db, causal=False)
            dqb += dq_
            dka, dva = dka + dk_, dva + dv_
            dq_, dk_, dv_ = bwd(qb, kb_, vb_, ob, lb, db, causal=True)
            dqb += dq_
            dkb, dvb = dk_, dv_
        else:
            dq_, dk_, dv_ = cond_bwd(src < s_idx, qa, ka, va, oa, la, da)
            dqa += dq_
            dka, dva = dk_, dv_
            dq_, dk_, dv_ = bwd(qb, ka, va, ob, lb, db, causal=False)
            dqb += dq_
            dka, dva = dka + dk_, dva + dv_
            dq_, dk_, dv_ = cond_bwd(src > s_idx, qb, kb_, vb_, ob, lb, db)
            dqb += dq_
            dkb, dvb = dk_, dv_

        dk_acc += jnp.concatenate([dka, dkb], axis=2)
        dv_acc += jnp.concatenate([dva, dvb], axis=2)

        if r + 1 < axis_size:
            kv_blk = kv_nxt
            dk_acc = _rotate(dk_acc, axis_name, axis_size)
            dv_acc = _rotate(dv_acc, axis_name, axis_size)

    # Accumulators sit one rotation short of home (as in ring.py).
    dk_acc = _rotate(dk_acc, axis_name, axis_size)
    dv_acc = _rotate(dv_acc, axis_name, axis_size)

    dq = jnp.concatenate([dqa, dqb], axis=2)
    return dq.astype(q.dtype), dk_acc.astype(k.dtype), dv_acc.astype(v.dtype)


def make_zigzag_ring_attention(axis_name: str, axis_size: int, *, scale: float):
    @jax.custom_vjp
    def fn(q, k, v):
        o, _ = _zigzag_fwd_impl(
            q, k, v, axis_name=axis_name, axis_size=axis_size, scale=scale
        )
        return o

    def fn_fwd(q, k, v):
        o, lse_ab = _zigzag_fwd_impl(
            q, k, v, axis_name=axis_name, axis_size=axis_size, scale=scale
        )
        return o, (q, k, v, o, lse_ab)

    def fn_bwd(res, do):
        q, k, v, o, lse_ab = res
        return _zigzag_bwd_impl(
            q, k, v, o, lse_ab, do,
            axis_name=axis_name, axis_size=axis_size, scale=scale,
        )

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def zigzag_ring_attention_sharded(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    seq_axis: str = "sp",
    head_axis: Optional[str] = None,
    scale: Optional[float] = None,
):
    """Whole-array causal zigzag ring attention (natural sequence order).

    Requires N % (2 * mesh.shape[seq_axis]) == 0 and self-attention shapes
    (Nq == Nkv; GQA KV heads replicated per shard is fine). ``head_axis``
    adds independent head (TP) sharding on top of the sequence ring, as in
    ring.py:ring_attention_sharded.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    s_count = mesh.shape[seq_axis]
    qz = zigzag_shuffle(q, s_count)
    kz = zigzag_shuffle(k, s_count)
    vz = zigzag_shuffle(v, s_count)

    spec = P(None, head_axis, seq_axis, None)
    fn = make_zigzag_ring_attention(seq_axis, s_count, scale=float(scale))
    oz = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(qz, kz, vz)
    return zigzag_unshuffle(oz, s_count)
