"""Head-sharded tensor-parallel attention.

Zero-communication attention sharding: Q heads (and their GQA KV groups)
are split across the ``tp`` mesh axis; each chip runs the FFPA kernel on its
head shard (SNIPPETS.md §1 pattern; SURVEY.md §2.8 TP row). Communication
happens only in the surrounding projections (psum after O-proj), which
belongs to the model layer (models/transformer.py), not here.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_fwd import flash_attention_forward
from ..interface import ffpa_attn_func


def head_parallel_attention(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    head_axis: str = "tp",
    scale: Optional[float] = None,
    is_causal: bool = False,
    enable_gqa: bool = False,
):
    """Shard attention over Q/KV heads; no collectives inside.

    Requires Hq % mesh.shape[head_axis] == 0 and, under GQA,
    Hkv % shards == 0 (KV heads co-located with their Q-head group).
    """
    tp = mesh.shape[head_axis]
    hq, hkv = q.shape[1], k.shape[1]
    if hq % tp != 0:
        raise ValueError(f"Hq={hq} not divisible by tp={tp}")
    if hkv % tp != 0:
        raise ValueError(
            f"Hkv={hkv} not divisible by tp={tp}; replicate KV heads or "
            "choose a smaller head axis"
        )

    spec = P(None, head_axis, None, None)

    def _local(q_, k_, v_):
        return ffpa_attn_func(
            q_,
            k_,
            v_,
            is_causal=is_causal,
            scale=scale,
            enable_gqa=enable_gqa,
        )

    return shard_map(
        _local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)


def paged_head_parallel_decode(
    q,
    cache,
    mesh: Mesh,
    *,
    head_axis: str = "tp",
    scale: Optional[float] = None,
):
    """Head-sharded PAGED decode: the page pools shard on their Hkv axis
    (each chip owns its KV heads' pages — the pool memory scales down with
    TP, which is the point of sharding a serving cache), page tables and
    lens replicate, and the page-gathered kernel runs per shard with its
    local GQA group. Zero collectives, like head_parallel_attention.
    """
    from ..ops.paged import PagedKVCache, paged_decode_attention

    tp = mesh.shape[head_axis]
    hq, hkv = q.shape[1], cache.k_pages.shape[1]
    if hq % tp != 0 or hkv % tp != 0:
        raise ValueError(
            f"Hq={hq}/Hkv={hkv} not divisible by {head_axis}={tp}"
        )

    qspec = P(None, head_axis, None, None)
    pool_spec = P(None, head_axis, None, None)

    def _local(q_, kp, vp, tbl, lens):
        return paged_decode_attention(
            q_, PagedKVCache(kp, vp, tbl, lens), scale=scale
        )

    return shard_map(
        _local,
        mesh=mesh,
        in_specs=(qspec, pool_spec, pool_spec, P(None, None), P(None)),
        out_specs=qspec,
        check_vma=False,
    )(q, cache.k_pages, cache.v_pages, cache.page_table, cache.lens)
