"""Ulysses-style sequence parallelism: all-to-all head-scatter attention.

The optional SP alternative from SURVEY.md §2.8 (absent in the reference,
which has no cross-device parallelism at all). Activations arrive
sequence-sharded [B, H, N/S, D]; two ``all_to_all`` collectives re-shard to
head-sharded [B, H/S, N, D] so each chip runs ONE dense FFPA kernel over
the FULL sequence on its head slice, then the inverse all-to-all restores
sequence sharding:

    q/k/v [B, H, N/S, D]  --all_to_all(head->seq)-->  [B, H/S, N, D]
    o = ffpa(q, k, v)      (full-sequence kernel, exact causal/tail masks)
    o [B, H/S, N, D]      --all_to_all(seq->head)-->  [B, H, N/S, D]

vs ring attention: Ulysses moves activations twice over ICI (4 all-to-alls
fwd) but runs the kernel unblocked at full sequence length — better when
H >= S and N is moderate; ring keeps activations resident and overlaps
permutes with compute — better for very long N or H < S. Both compose with
the same ``sp`` mesh axis; pick per shape.

Gradients come for free: ``jax.lax.all_to_all`` is linear, so autograd
differentiates through the collective (no custom_vjp needed) into the FFPA
custom_vjp kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..interface import ffpa_attn_func


def _ulysses_local(
    q, k, v, *, axis_name, scale, causal, enable_gqa,
    softcap=0.0, window=(-1, -1), alibi_slopes=None, sinks=None,
):
    # [B, H, Nl, D] -> [B, Hl, N, D]: scatter heads, gather sequence.
    a2a = lambda x: jax.lax.all_to_all(
        x, axis_name, split_axis=1, concat_axis=2, tiled=True
    )
    q_h, k_h, v_h = a2a(q), a2a(k), a2a(v)
    # Each chip holds the FULL sequence for its head block, so every
    # feature works unchanged; per-head operands (ALiBi slopes, sinks)
    # slice to the chip's head range. all_to_all(split_axis=1, tiled)
    # gives chip i heads [i*Hl, (i+1)*Hl).
    extra = {}
    if softcap and softcap > 0.0:
        extra["softcap"] = softcap
    if window != (-1, -1):
        extra["window_size"] = window
    if alibi_slopes is not None or sinks is not None:
        idx = jax.lax.axis_index(axis_name)
        hl = q_h.shape[1]
        if alibi_slopes is not None:
            extra["alibi_slopes"] = jax.lax.dynamic_slice_in_dim(
                alibi_slopes, idx * hl, hl, axis=-1
            )
        if sinks is not None:
            extra["sinks"] = jax.lax.dynamic_slice_in_dim(
                sinks, idx * hl, hl
            )
    o_h = ffpa_attn_func(
        q_h, k_h, v_h, is_causal=causal, scale=scale, enable_gqa=enable_gqa,
        **extra,
    )
    # [B, Hl, N, D] -> [B, H, Nl, D]: gather heads, scatter sequence.
    return jax.lax.all_to_all(
        o_h, axis_name, split_axis=2, concat_axis=1, tiled=True
    )


def ulysses_attention(
    q,
    k,
    v,
    *,
    axis_name: str,
    scale: Optional[float] = None,
    causal: bool = False,
    enable_gqa: bool = False,
    softcap: float = 0.0,
    window=(-1, -1),
    alibi_slopes=None,
    sinks=None,
):
    """Per-shard entry (call inside an existing shard_map with ``axis_name``).

    Per-shard shapes: q [B, Hq, Nq/S, D], k/v [B, Hkv, Nkv/S, D].
    Requires Hq % S == 0 (and Hkv % S == 0 under GQA) — the all-to-all
    scatters the head axis across S chips. softcap/window/alibi/sinks
    compose (full sequence per head block; per-head operands replicated
    and sliced in-shard).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    return _ulysses_local(
        q, k, v, axis_name=axis_name, scale=float(scale), causal=causal,
        enable_gqa=enable_gqa, softcap=softcap, window=tuple(window),
        alibi_slopes=alibi_slopes, sinks=sinks,
    )


def ulysses_attention_sharded(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    seq_axis: str = "sp",
    scale: Optional[float] = None,
    causal: bool = False,
    enable_gqa: bool = False,
    softcap: float = 0.0,
    window=(-1, -1),
    alibi_slopes=None,
    sinks=None,
):
    """Whole-array entry: q/k/v sequence-sharded on ``seq_axis``.
    softcap/window/alibi/sinks compose (see ``ulysses_attention``)."""
    sp = mesh.shape[seq_axis]
    hq, hkv = q.shape[1], k.shape[1]
    if hq % sp != 0:
        raise ValueError(f"Ulysses requires Hq % sp == 0, got {hq} % {sp}")
    if hkv % sp != 0:
        raise ValueError(f"Ulysses requires Hkv % sp == 0, got {hkv} % {sp}")
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(None, None, seq_axis, None)
    small_specs, small_args = [], []
    import jax.numpy as jnp

    if alibi_slopes is not None:
        small_specs.append(P())
        small_args.append(jnp.asarray(alibi_slopes, jnp.float32))
    if sinks is not None:
        small_specs.append(P())
        small_args.append(jnp.asarray(sinks, jnp.float32))

    def _local(q_, k_, v_, *small):
        pos = 0
        al = sk = None
        if alibi_slopes is not None:
            al = small[pos]
            pos += 1
        if sinks is not None:
            sk = small[pos]
        return _ulysses_local(
            q_, k_, v_, axis_name=seq_axis, scale=float(scale),
            causal=causal, enable_gqa=enable_gqa,
            softcap=softcap, window=tuple(window),
            alibi_slopes=al, sinks=sk,
        )

    return shard_map(
        _local,
        mesh=mesh,
        in_specs=(spec, spec, spec, *small_specs),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, *small_args)
