"""Sequence-sharded sliding-window attention via HALO EXCHANGE.

Windowed attention under sequence sharding does not need a ring: a query
row at global position p attends only ``[p - W, p]`` (causal window), so a
chip owning rows ``[i*Nl, (i+1)*Nl)`` needs at most ``H = ceil(W / Nl)``
left-neighbor shards of K/V. One ``ppermute`` per halo step fetches them —
O(H * Nl) ICI bytes per chip versus the ring's O(S * Nl) full rotation —
and every query's entire window is then LOCAL, so there is no cross-chip
LSE merge at all (the merge-free structure is also what lets softcap /
ALiBi / sinks compose exactly; the ring cannot host them because its
per-step partial softmaxes see incomplete rows).

Positions are preserved exactly in the extended layout: local Q row r is
global ``r + i*Nl``; extended KV col c is global ``c + (i - H)*Nl``, so
with the dense kernel's tail-aligned offset ``nkv_ext - nq = H*Nl`` the
causal band, the window band, and the ALiBi distance all equal their
unsharded values. Chips ``i < H`` receive wrapped-around blocks from the
sequence END; a compact key-only bias (``[1,1,1,(H+1)*Nl]``, built from
``axis_index``) masks the columns whose global position is negative —
identical to the unsharded window clipping at position 0.

Gradients flow through ``jax.grad`` directly: the halo ppermutes and the
concat are standard-differentiable (ppermute's transpose returns the halo
K/V gradients to their owners), and the attention itself is the library's
``custom_vjp`` core. No bespoke backward scheme is needed — another
consequence of the merge-free structure.

Reference relation: the reference has no cross-device anything (SURVEY.md
§2.8) and rejects ``window_size`` outright; this module composes two of
FFPA-TPU's beyond-reference tiers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.reference import DEFAULT_MASK_VALUE


def _shift_left_block(x, axis_name: str, size: int):
    """Each chip receives its LEFT neighbor's block (chip i gets i-1)."""
    return lax.ppermute(
        x, axis_name, perm=[(i, (i + 1) % size) for i in range(size)]
    )


def window_attention(
    q,
    k,
    v,
    *,
    axis_name: str,
    axis_size: int,
    window_left: int,
    scale: Optional[float] = None,
    softcap: float = 0.0,
    alibi_slopes=None,
    sinks=None,
):
    """Per-shard causal sliding-window attention (call inside shard_map).

    Shapes per shard: q [B, Hq, Nl, D], k/v [B, Hkv, Nl, D] — Q and KV
    sharded identically on the sequence axis. ``window_left`` is the
    causal left-window width W (global semantics: row p attends
    [p - W, p]).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    nl = q.shape[2]
    halo = max(0, -(-int(window_left) // nl))  # ceil(W / Nl)
    if halo >= axis_size:
        raise ValueError(
            f"window_left={window_left} needs {halo} halo shards but the "
            f"axis has only {axis_size}; at W >= N the window is dense — "
            "use ring/zigzag attention instead"
        )
    idx = lax.axis_index(axis_name)

    parts = []
    blk_k, blk_v = k, v
    for _ in range(halo):
        blk_k = _shift_left_block(blk_k, axis_name, axis_size)
        blk_v = _shift_left_block(blk_v, axis_name, axis_size)
        # After s shifts the resident block came from chip i - s: prepend
        # so the concat is globally ordered [i-H, .., i-1, i].
        parts.insert(0, (blk_k, blk_v))
    k_ext = jnp.concatenate([p[0] for p in parts] + [k], axis=2)
    v_ext = jnp.concatenate([p[1] for p in parts] + [v], axis=2)

    # Key-only validity bias: extended col c is global (i - H)*Nl + c;
    # columns with negative global position (the wrap-around blocks the
    # first H chips receive) are masked — the unsharded window clips at
    # position 0 the same way.
    nkv_ext = (halo + 1) * nl
    cols = jnp.arange(nkv_ext, dtype=jnp.int32)
    valid = cols >= (halo - idx) * nl
    bias = jnp.where(valid, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
    bias = bias[None, None, None, :]

    from ..interface import ffpa_attn_func

    return ffpa_attn_func(
        q,
        k_ext,
        v_ext,
        attn_mask=bias,
        is_causal=True,
        scale=scale,
        enable_gqa=q.shape[1] != k.shape[1],
        window_size=(int(window_left), -1),
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        sinks=sinks,
    )


def window_attention_sharded(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    seq_axis: str = "sp",
    head_axis: Optional[str] = None,
    window_left: int,
    scale: Optional[float] = None,
    softcap: float = 0.0,
    alibi_slopes=None,
    sinks=None,
):
    """Whole-array entry: causal sliding-window attention with Q/K/V
    sharded on ``seq_axis`` (and optionally heads on ``head_axis``),
    halo-exchange comms. Composes with softcap / ALiBi / sinks (replicated
    small operands). Differentiable via ``jax.grad``."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    axis_size = mesh.shape[seq_axis]
    h = head_axis
    spec = P(None, h, seq_axis, None)
    small_specs = []
    small_args = []
    if alibi_slopes is not None:
        small_specs.append(P(h) if h else P())
        small_args.append(jnp.asarray(alibi_slopes, jnp.float32))
    if sinks is not None:
        small_specs.append(P(h) if h else P())
        small_args.append(jnp.asarray(sinks, jnp.float32))

    def fn(q_, k_, v_, *small):
        pos = 0
        al = None
        sk = None
        if alibi_slopes is not None:
            al = small[pos]
            pos += 1
        if sinks is not None:
            sk = small[pos]
        return window_attention(
            q_, k_, v_,
            axis_name=seq_axis, axis_size=axis_size,
            window_left=window_left, scale=float(scale),
            softcap=float(softcap), alibi_slopes=al, sinks=sk,
        )

    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, *small_specs),
        out_specs=spec,
        check_vma=False,
    )
    return sharded(q, k, v, *small_args)
