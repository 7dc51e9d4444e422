"""Analytic attention FLOPs model (reference: src/ffpa_attn/cli/_flops.py).

fwd = 4 * B * Hq * D * valid_pairs (two GEMMs: QK^T and PV);
bwd = 2.5 * fwd (reference _flops.py:38-76). ``attention_valid_pairs``
counts exact tail-aligned-causal (q, k) pairs including the decode tail.
"""

from __future__ import annotations


def attention_valid_pairs(nq: int, nkv: int, causal: bool) -> int:
    """Exact number of attended (q, k) pairs.

    Tail-aligned causal: row m (0-based) attends cols <= m + (nkv - nq),
    i.e. (nkv - nq + m + 1) pairs — requires nkv >= nq.
    """
    if not causal:
        return nq * nkv
    offset = nkv - nq
    # sum_{m=0}^{nq-1} (offset + m + 1)
    return nq * (offset + 1) + (nq - 1) * nq // 2


def attention_flops(
    b: int,
    hq: int,
    nq: int,
    nkv: int,
    d: int,
    dv: int | None = None,
    *,
    causal: bool = False,
    direction: str = "fwd",
) -> float:
    dv = d if dv is None else dv
    pairs = attention_valid_pairs(nq, nkv, causal)
    fwd = 2.0 * b * hq * pairs * (d + dv)
    if direction == "fwd":
        return fwd
    if direction == "bwd":
        return 2.5 * fwd
    if direction == "fwd_bwd":
        return 3.5 * fwd
    raise ValueError(f"direction must be fwd|bwd|fwd_bwd, got {direction}")


def tflops_from_ms(flops: float, ms: float) -> float:
    return flops / (ms * 1e-3) / 1e12


def format_tflops(tflops: float) -> str:
    """Compact '97T' formatting (reference _flops.py)."""
    if tflops >= 10:
        return f"{tflops:.0f}T"
    return f"{tflops:.1f}T"
