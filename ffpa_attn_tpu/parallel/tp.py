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
