"""Block-config selection: persistent tuned-config lookup with heuristic
defaults.

The analog of the reference's non-autotune launcher path — persistent-config
lookup else defaults (reference: triton/_ffpa_fwd.py:971-995,
_persistent_autotune.py:735).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .config import BlockConfig, default_config


def pick_forward_config(
    *,
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    dtype,
    causal: bool,
    has_bias: bool,
    dropout: bool = False,
    gqa: bool = False,
) -> BlockConfig:
    """Tuned-config lookup, falling back to the heuristic default."""
    from ..autotune.store import lookup_tuned_config

    cfg = lookup_tuned_config(
        direction="fwd",
        d=d,
        dv=dv,
        nq=nq,
        nkv=nkv,
        dtype=str(jnp.dtype(dtype)),
        causal=causal,
        has_bias=has_bias,
        dropout=dropout,
        gqa=gqa,
    )
    if cfg is not None:
        return cfg
    itemsize = jnp.dtype(dtype).itemsize
    return default_config(d, dv, nq, nkv, itemsize=itemsize, has_bias=has_bias)


def pick_backward_config(
    *,
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    dtype,
    causal: bool,
    has_bias: bool,
    dropout: bool = False,
    gqa: bool = False,
) -> BlockConfig:
    from ..autotune.store import lookup_tuned_config

    cfg = lookup_tuned_config(
        direction="bwd",
        d=d,
        dv=dv,
        nq=nq,
        nkv=nkv,
        dtype=str(jnp.dtype(dtype)),
        causal=causal,
        has_bias=has_bias,
        dropout=dropout,
        gqa=gqa,
    )
    if cfg is not None:
        return cfg
    itemsize = jnp.dtype(dtype).itemsize
    base = default_config(d, dv, nq, nkv, itemsize=itemsize, has_bias=has_bias)
    # Backward tiles default smaller: three live matrices per cell.
    from dataclasses import replace

    shrink = max(128, (base.block_kv // 2) // 128 * 128)
    return replace(
        base,
        block_q_dkdv=min(base.block_q, 256),
        block_kv_dkdv=min(shrink, 256),
        block_q_dq=min(base.block_q, 256),
        block_kv_dq=min(shrink, 256),
    )
