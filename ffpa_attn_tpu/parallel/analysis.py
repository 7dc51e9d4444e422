"""Analytic ring-attention scaling model (roofline projection).

Single-chip hardware cannot *measure* multi-chip scaling (one v5e chip is
attached); this model projects it from first principles so the >= 85%
two-host target (BASELINE.md) is an engineering statement rather than a
hope. The structure mirrors the implementation in ``ring.py``:

Per ring step (S chips, sequence N sharded to N/S per chip):

* compute: the local tile pair's two MXU matmuls,
  ``t_step = 2 * B * Hq * (N/S)^2 * (d + dv) / MXU``;
* communication: rotate the K/V pair one hop. Under GQA only the KV heads
  travel: ``bytes = 2 * B * Hkv * (N/S) * d * itemsize``.

The ppermute for step r+1 is issued while step r's matmuls run, so in
steady state every chip advances at ``max(t_step, t_slowest_hop)`` (a slow
edge throttles the whole lock-step rotation). Efficiency = ideal (1-chip
time / S) over projected.

Bandwidth constants: v5e chips link in a 2D torus at ~45 GB/s effective
per neighbor hop — and a multi-HOST v5e slice (e.g. v5e-16 = 4 hosts) is
still one ICI domain, so "2 hosts" rings ride ICI; DCN (~12.5 GB/s) only
enters across *slices*, which the mesh recipe avoids for sp (mesh.py).

Balance point (bf16, MXU at 85%): full overlap needs
``shard >= mxu_eff_flops * 2 * Hkv/Hq * d/(d+dv) / ICI_BW`` ~ 3700 rows
for MHA self-attention — i.e. N >= 30K at S=8 — but only ~930 rows under
4:1 GQA, so the dominant training/serving configs scale at >= 85% from
N = 8K up (see ``two_host_report``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..utils.profiling import PEAK_BF16_FLOPS

ICI_BW_BYTES = 45e9  # per-hop effective one-way (v5e neighbor link)
DCN_BW_BYTES = 12.5e9  # ~100 Gb/s cross-SLICE interconnect per direction
STEP_LATENCY_S = 5e-6  # collective issue + barrier per ring step


@dataclass(frozen=True)
class RingProjection:
    chips: int
    t_step_ms: float  # per-step compute (per chip)
    t_hop_ms: float  # per-step slowest KV hop
    t_total_ms: float
    efficiency: float  # vs perfect linear scaling of the 1-chip time

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"S={self.chips}: step {self.t_step_ms:.2f} ms, "
            f"hop {self.t_hop_ms:.2f} ms -> total {self.t_total_ms:.2f} ms "
            f"({self.efficiency * 100:.1f}% scaling efficiency)"
        )


def ring_scaling_projection(
    *,
    b: int,
    h: int,
    n: int,
    d: int,
    dv: Optional[int] = None,
    hkv: Optional[int] = None,
    chips: int,
    itemsize: int = 2,
    mxu_efficiency: float = 0.85,
    mxu_flops: Optional[float] = None,
    hops_over_dcn: int = 0,
    causal: bool = False,
) -> RingProjection:
    """Project ring-attention forward scaling efficiency at ``chips``.

    ``hkv``: KV heads actually rotated (GQA rotates fewer bytes).
    ``hops_over_dcn``: ring hops that cross a SLICE boundary (0 within a
    multi-host slice; the slowest hop throttles the rotation).
    ``causal`` models the zigzag schedule (balanced chunk pairs: half the
    pair FLOPs per step, same rotated bytes).
    ``mxu_flops``: the MEASURED single-chip attention FLOPs rate (e.g.
    this chip's benched 165e12 at the flagship shape); overrides the
    ``peak * mxu_efficiency`` spec estimate so the projection's compute
    leg is anchored to reality. The ICI constant cannot be measured with
    one attached chip and stays a labeled spec number.
    """
    dv = dv if dv is not None else d
    hkv = hkv if hkv is not None else h
    s = chips
    shard = n // s
    flops_per_step = 2 * b * h * shard * shard * (d + dv)
    if causal:
        flops_per_step //= 2
    mxu = mxu_flops if mxu_flops else PEAK_BF16_FLOPS * mxu_efficiency
    t_step = flops_per_step / mxu

    kv_bytes = 2 * b * hkv * shard * d * itemsize  # K and V blocks
    t_hop = kv_bytes / (DCN_BW_BYTES if hops_over_dcn > 0 else ICI_BW_BYTES)

    period = max(t_step, t_hop) + STEP_LATENCY_S
    t_total = s * period

    t_one = (
        2 * b * h * n * n * (d + dv) // (2 if causal else 1)
    ) / mxu
    ideal = t_one / s
    eff = ideal / t_total
    return RingProjection(
        chips=s,
        t_step_ms=t_step * 1e3,
        t_hop_ms=t_hop * 1e3,
        t_total_ms=t_total * 1e3,
        efficiency=min(eff, 1.0),
    )


def two_host_report(
    b: int = 1, h: int = 32, n: int = 16384, d: int = 512,
    mxu_flops: Optional[float] = None,
) -> list[RingProjection]:
    """The BASELINE.md >= 85% @ 2 hosts scenario: 8 chips of a v5e-8 slice
    (one ICI domain), MHA and 4:1 GQA variants at S in {2, 4, 8}.
    ``mxu_flops``: measured single-chip rate (see
    ``ring_scaling_projection``); the bench ``--e2e`` path passes the
    rate it just measured on the attached chip."""
    out = []
    for hkv in (h, h // 4):
        for s in (2, 4, 8):
            out.append(
                ring_scaling_projection(
                    b=b, h=h, hkv=hkv, n=n, d=d, chips=s,
                    mxu_flops=mxu_flops,
                )
            )
    return out
