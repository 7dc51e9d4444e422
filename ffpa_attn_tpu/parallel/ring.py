"""Sequence-sharded ring attention over ICI.

The scaling tier the reference lacks (SURVEY.md §2.8, §5 long-context):
KV blocks rotate around the ``sp`` mesh axis via ``jax.lax.ppermute`` while
each chip runs the FFPA Pallas kernel on its resident Q shard — the
cross-device generalization of the reference's split-KV LSE merge
(reference: triton/_ffpa_fwd.py:762-831 stage-2 formula
``O = sum_c exp(LSE_c - LSE) * O_c`` — reused verbatim here as the
cross-chip combine).

Design:

* **Forward**: python-unrolled loop over the S ring steps (S = axis size is
  static). The ppermute for step s+1 is issued *before* step s's attention
  so XLA overlaps the ICI transfer with the Pallas kernel (SURVEY.md §7
  hard part 4).
* **Causal**: with Q and KV sharded identically, the KV block received at
  step s originates from chip ``(idx - s) % S``; step 0 is the diagonal
  (tail-aligned causal inside the kernel), steps ``s <= idx`` are fully
  visible (non-causal kernel), steps ``s > idx`` are fully masked —
  handled by ``lax.cond`` so masked steps skip the matmuls entirely.
* **Backward**: custom_vjp implementing the rotating-accumulator scheme:
  re-rotate (k, v) forward again, each chip adds its (dk, dv) contribution
  for the block it currently holds, and the accumulators ride the same
  ppermute so after S steps they arrive home with all contributions
  (dq accumulates locally). No O(S) KV residuals, no O(S^2) comms.

Only dropout-free attention is supported across the ring (dropout would
need a global element indexing across shards — future work, mirroring the
reference's varlen kwarg rejection style).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_bwd import flash_attention_backward
from ..ops.flash_fwd import flash_attention_forward


def _merge(o_a, lse_a, o_b, lse_b):
    """LSE-merge two normalized partial attention results.

    Identical math to the reference's decode stage-2 merge
    (triton/_ffpa_fwd.py:762-831).
    """
    lse_max = jnp.maximum(lse_a, lse_b)
    # exp(-inf - -inf) guard: where both are -inf the weights are 0.
    w_a = jnp.exp(lse_a - jnp.where(jnp.isinf(lse_max), 0.0, lse_max))
    w_b = jnp.exp(lse_b - jnp.where(jnp.isinf(lse_max), 0.0, lse_max))
    denom = w_a + w_b
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (
        o_a.astype(jnp.float32) * (w_a / denom_safe)[..., None]
        + o_b.astype(jnp.float32) * (w_b / denom_safe)[..., None]
    )
    lse = lse_max + jnp.log(denom_safe)
    return o, lse


def _rotate(x, axis_name: str, size: int):
    return lax.ppermute(
        x, axis_name, perm=[(i, (i + 1) % size) for i in range(size)]
    )


def _ring_fwd_impl(q, k, v, *, axis_name: str, axis_size: int, scale: float,
                   causal: bool):
    """Per-shard ring forward. Returns (o [B,H,Nl,Dv] in q.dtype, lse f32)."""
    my_idx = lax.axis_index(axis_name)
    b, hq, nl, _ = q.shape
    dv_dim = v.shape[-1]

    o_acc = jnp.zeros((b, hq, nl, dv_dim), jnp.float32)
    lse_acc = jnp.full((b, hq, nl), -jnp.inf, jnp.float32)

    k_blk, v_blk = k, v
    for s in range(axis_size):
        # Launch the rotation for the next step first so XLA overlaps the
        # ICI ppermute with this step's kernel.
        if s + 1 < axis_size:
            k_nxt = _rotate(k_blk, axis_name, axis_size)
            v_nxt = _rotate(v_blk, axis_name, axis_size)

        if causal and s == 0:
            o_s, lse_s = flash_attention_forward(
                q, k_blk, v_blk, None, scale=scale, is_causal=True
            )
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_s, lse_s)
        elif causal:

            def _attend(args):
                q_, k_, v_ = args
                return flash_attention_forward(
                    q_, k_, v_, None, scale=scale, is_causal=False
                )

            def _skip(args):
                q_, _, v_ = args
                return (
                    jnp.zeros((b, hq, nl, dv_dim), q.dtype),
                    jnp.full((b, hq, nl), -jnp.inf, jnp.float32),
                )

            # Block from chip (my-s)%S is fully visible iff s <= my_idx.
            o_s, lse_s = lax.cond(s <= my_idx, _attend, _skip, (q, k_blk, v_blk))
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_s, lse_s)
        else:
            o_s, lse_s = flash_attention_forward(
                q, k_blk, v_blk, None, scale=scale, is_causal=False
            )
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_s, lse_s)

        if s + 1 < axis_size:
            k_blk, v_blk = k_nxt, v_nxt

    return o_acc.astype(q.dtype), lse_acc


def _ring_bwd_impl(q, k, v, o, lse, do, *, axis_name: str, axis_size: int,
                   scale: float, causal: bool):
    """Rotating-accumulator ring backward. Returns (dq, dk, dv) with dk/dv
    delivered to the home shard of each KV block."""
    my_idx = lax.axis_index(axis_name)
    dq_acc = jnp.zeros(q.shape, jnp.float32)
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)

    k_blk, v_blk = k, v
    for s in range(axis_size):
        # Prefetch-rotate k/v BEFORE this step's kernels (same as the
        # forward): the next step's kernels depend on the rotated blocks,
        # so issuing the ppermute first lets XLA overlap the ICI hop with
        # this step's compute — in the pass that carries 2.5x the
        # forward's FLOPs (round-2 weak #8: the old rotate-after-kernels
        # order serialized every backward hop). The dk/dv ACCUMULATOR
        # rotation cannot be hoisted (it must include this step's
        # contribution) but is not on the critical path either: its only
        # consumer is the `+=` AFTER the next step's kernels, so that
        # ppermute also rides under compute.
        if s + 1 < axis_size:
            k_nxt = _rotate(k_blk, axis_name, axis_size)
            v_nxt = _rotate(v_blk, axis_name, axis_size)

        if causal and s == 0:
            dq_s, dk_s, dv_s, _ = flash_attention_backward(
                q, k_blk, v_blk, None, o, lse, do,
                scale=scale, is_causal=True,
                grad_kv_storage_dtype="f32", grad_q_storage_dtype="f32",
            )
            dq_acc += dq_s
            dk_acc += dk_s
            dv_acc += dv_s
        else:

            def _step(args):
                q_, k_, v_, o_, lse_, do_ = args
                dq_s, dk_s, dv_s, _ = flash_attention_backward(
                    q_, k_, v_, None, o_, lse_, do_,
                    scale=scale, is_causal=False,
                    grad_kv_storage_dtype="f32", grad_q_storage_dtype="f32",
                )
                return dq_s, dk_s, dv_s

            def _skip(args):
                q_, k_, v_, *_ = args
                return (
                    jnp.zeros(q_.shape, jnp.float32),
                    jnp.zeros(k_.shape, jnp.float32),
                    jnp.zeros(v_.shape, jnp.float32),
                )

            visible = True if not causal else (s <= my_idx)
            if causal:
                dq_s, dk_s, dv_s = lax.cond(
                    visible, _step, _skip, (q, k_blk, v_blk, o, lse, do)
                )
            else:
                dq_s, dk_s, dv_s = _step((q, k_blk, v_blk, o, lse, do))
            dq_acc += dq_s
            dk_acc += dk_s
            dv_acc += dv_s

        if s + 1 < axis_size:
            # KV blocks and their gradient accumulators rotate together so
            # each accumulator returns home after S-1 further rotations at
            # the loop end.
            k_blk, v_blk = k_nxt, v_nxt
            dk_acc = _rotate(dk_acc, axis_name, axis_size)
            dv_acc = _rotate(dv_acc, axis_name, axis_size)

    # After S-1 rotations the accumulator for home block sits one step short
    # of a full cycle: rotate once more to complete it.
    dk_acc = _rotate(dk_acc, axis_name, axis_size)
    dv_acc = _rotate(dv_acc, axis_name, axis_size)

    return dq_acc.astype(q.dtype), dk_acc.astype(k.dtype), dv_acc.astype(v.dtype)


def make_ring_attention(axis_name: str, axis_size: int, *, scale: float,
                        causal: bool):
    """Build the per-shard ring attention fn (for use inside shard_map)."""

    @functools.partial(jax.custom_vjp)
    def ring_fn(q, k, v):
        o, _ = _ring_fwd_core(q, k, v)
        return o

    def _ring_fwd_core(q, k, v):
        return _ring_fwd_impl(
            q, k, v, axis_name=axis_name, axis_size=axis_size, scale=scale,
            causal=causal,
        )

    def ring_fwd(q, k, v):
        o, lse = _ring_fwd_core(q, k, v)
        return o, (q, k, v, o, lse)

    def ring_bwd(residuals, do):
        q, k, v, o, lse = residuals
        return _ring_bwd_impl(
            q, k, v, o, lse, do, axis_name=axis_name, axis_size=axis_size,
            scale=scale, causal=causal,
        )

    ring_fn.defvjp(ring_fwd, ring_bwd)
    return ring_fn


def ring_attention(q, k, v, *, axis_name: str, axis_size: int,
                   scale: Optional[float] = None, causal: bool = False):
    """Per-shard entry (call inside an existing shard_map with ``axis_name``).

    Shapes per shard: q [B, Hq, Nq/S, D], k/v [B, Hkv, Nkv/S, D].
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    fn = make_ring_attention(axis_name, axis_size, scale=float(scale),
                             causal=causal)
    return fn(q, k, v)


def ring_attention_sharded(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    seq_axis: str = "sp",
    head_axis: Optional[str] = None,
    scale: Optional[float] = None,
    causal: bool = False,
):
    """Whole-array entry: shards Q/K/V on the sequence (and optionally head)
    axes and runs ring attention (2-D parallelism: ring on ``seq_axis``,
    independent heads on ``head_axis``).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    axis_size = mesh.shape[seq_axis]
    h = head_axis
    spec = P(None, h, seq_axis, None)

    fn = make_ring_attention(seq_axis, axis_size, scale=float(scale),
                             causal=causal)

    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return sharded(q, k, v)
