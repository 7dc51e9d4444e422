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
    # Greedy from the measured v5e ranking: large streamed-Q blocks amortize
    # the owner KV tile; (1024, 512) won the D=512 N=8192 sweep (111.5 TF vs
    # 95.9 TF for (256, 256)).
    from ..env import ENV
    from .config import BlockConfig, bwd_dkdv_vmem_bytes, bwd_dq_vmem_bytes

    limit = ENV.vmem_limit_bytes()
    for bq in (1024, 512, 256, 128):
        for bkv in (512, 256, 128):
            cfg = BlockConfig(
                block_q_dkdv=bq,
                block_kv_dkdv=bkv,
                block_q_dq=bq,
                block_kv_dq=bkv,
            ).clamp(nq, nkv)
            if (
                bwd_dkdv_vmem_bytes(cfg, d, dv, itemsize, has_bias) <= limit
                and bwd_dq_vmem_bytes(cfg, d, dv, itemsize, has_bias) <= limit
            ):
                return cfg
    return BlockConfig(
        block_q_dkdv=128, block_kv_dkdv=128, block_q_dq=128, block_kv_dq=128
    ).clamp(nq, nkv)
