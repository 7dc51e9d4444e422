"""Timed block-shape search (the TPU analog of triton.autotune).

Reference analog: the autotune wrapper + resilient runner
(reference: triton/_ffpa_fwd.py:1301-1334, triton/_autotune_utils.py:113-180).
On TPU the config space is (block_q, block_kv) per direction; candidates are
pre-pruned by the VMEM cost model (so Mosaic never sees an impossible
config — SURVEY.md §7 hard part 6) and any config that still fails to
compile is skipped, mirroring the reference's resilient-autotuner fallback
walk.
"""

from __future__ import annotations

import time
from dataclasses import replace
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from ..env import ENV
from ..logger import init_logger
from ..ops.config import (
    LANE,
    BlockConfig,
    bwd_dkdv_vmem_bytes,
    bwd_dq_vmem_bytes,
    fwd_vmem_bytes,
)

logger = init_logger(__name__)

_FAST_BLOCKS = (256, 512, 1024)
_MAX_BLOCKS = (128, 256, 512, 1024, 2048)


def fwd_candidates(
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    itemsize: int,
    has_bias: bool,
    mode: str = "fast",
) -> list[BlockConfig]:
    """VMEM-feasible forward (block_q, block_kv) candidates."""
    blocks = _FAST_BLOCKS if mode == "fast" else _MAX_BLOCKS
    limit = ENV.vmem_limit_bytes()
    out = []
    for bq in blocks:
        for bkv in blocks:
            cfg = BlockConfig(block_q=bq, block_kv=bkv).clamp(nq, nkv)
            if fwd_vmem_bytes(cfg, d, dv, itemsize, has_bias) > limit:
                continue
            if cfg not in out:
                out.append(cfg)
    max_configs = ENV.autotune_max_configs()
    if max_configs > 0:
        out = out[:max_configs]
    return out


def bwd_candidates(
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    itemsize: int,
    has_bias: bool,
    mode: str = "fast",
) -> list[BlockConfig]:
    """Backward candidates: shared (bq, bkv) for dkdv and dq launches."""
    blocks = _FAST_BLOCKS if mode == "fast" else _MAX_BLOCKS
    limit = ENV.vmem_limit_bytes()
    out = []
    for bq in blocks:
        for bkv in blocks:
            cfg = BlockConfig(
                block_q_dkdv=bq,
                block_kv_dkdv=bkv,
                block_q_dq=bq,
                block_kv_dq=bkv,
            ).clamp(nq, nkv)
            if (
                bwd_dkdv_vmem_bytes(cfg, d, dv, itemsize, has_bias) > limit
                or bwd_dq_vmem_bytes(cfg, d, dv, itemsize, has_bias) > limit
            ):
                continue
            if cfg not in out:
                out.append(cfg)
    max_configs = ENV.autotune_max_configs()
    if max_configs > 0:
        out = out[:max_configs]
    return out


def search(
    make_step: Callable[[BlockConfig], Callable],
    q,
    rest: tuple,
    candidates: Iterable[BlockConfig],
    label: str = "",
    iters: int = 5,
) -> tuple[Optional[BlockConfig], float]:
    """Time every candidate with scan-chained iterations (one jit invocation
    per candidate, so the remote-dispatch fixed overhead cancels); skip
    compile/runtime failures — the resilient walk of the reference autotuner
    (triton/_autotune_utils.py:113-180).

    Returns (best_config, best_ms); (None, inf) if everything failed.
    """
    from ..cli._bench import time_chained

    best: Optional[BlockConfig] = None
    best_ms = float("inf")
    for cfg in candidates:
        try:
            ms = time_chained(make_step(cfg), q, *rest, iters=iters)
        except Exception as exc:  # Mosaic OOM / lowering error: skip
            logger.debug_once(
                "autotune[%s]: config %s failed: %s", label, cfg, str(exc)[:200]
            )
            continue
        logger.debug("autotune[%s]: %s -> %.3f ms", label, cfg, ms)
        if ms < best_ms:
            best, best_ms = cfg, ms
    return best, best_ms


def autotune_forward(
    q, k, v, bias, *, scale, is_causal, dropout_p=0.0, mode="fast"
) -> tuple[Optional[BlockConfig], float]:
    from ..ops.flash_fwd import flash_attention_forward

    d, dv = q.shape[-1], v.shape[-1]
    nq, nkv = q.shape[2], k.shape[2]
    itemsize = jnp.dtype(q.dtype).itemsize
    cands = fwd_candidates(d, dv, nq, nkv, itemsize, bias is not None, mode)

    def make_step(cfg):
        def step(q_, k_, v_):
            o, _ = flash_attention_forward(
                q_, k_, v_, bias, scale=scale, is_causal=is_causal,
                dropout_p=dropout_p, config=cfg,
            )
            return o

        return step

    return search(
        make_step, q, (k, v), cands, label=f"fwd d={d} n=({nq},{nkv})"
    )


def autotune_backward(
    q, k, v, bias, *, scale, is_causal, dropout_p=0.0, mode="fast"
) -> tuple[Optional[BlockConfig], float]:
    from ..ops.flash_bwd import flash_attention_backward
    from ..ops.flash_fwd import flash_attention_forward

    d, dv = q.shape[-1], v.shape[-1]
    nq, nkv = q.shape[2], k.shape[2]
    itemsize = jnp.dtype(q.dtype).itemsize
    cands = bwd_candidates(d, dv, nq, nkv, itemsize, bias is not None, mode)

    o, lse = jax.jit(
        lambda q_, k_, v_, b_: flash_attention_forward(
            q_, k_, v_, b_, scale=scale, is_causal=is_causal,
            dropout_p=dropout_p,
        )
    )(q, k, v, bias)
    do = jnp.ones_like(o)

    def make_step(cfg):
        def step(q_, k_, v_, o_, lse_, do_):
            # Chain on dq; fold dk/dv into the scalar extra so XLA cannot
            # dead-code-eliminate the dK/dV kernel.
            dq, dk, dvv, _ = flash_attention_backward(
                q_, k_, v_, bias, o_, lse_, do_, scale=scale,
                is_causal=is_causal, dropout_p=dropout_p, config=cfg,
            )
            extra = jnp.sum(dk.astype(jnp.float32)) + jnp.sum(
                dvv.astype(jnp.float32)
            )
            return dq, extra

        return step

    return search(
        make_step,
        q,
        (k, v, o, lse, do),
        cands,
        label=f"bwd d={d} n=({nq},{nkv})",
    )
