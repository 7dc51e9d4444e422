"""Tracing / profiling helpers.

The reference's observability tier (SURVEY.md §5): FA_LOG_LEVEL device
logging, FFPA_PTXAS_VERBOSE register dumps, ncu wrappers. TPU equivalents:

* ``trace(path)`` — jax.profiler trace context (view in XProf/TensorBoard).
* ``mosaic_dump(dir)`` — sets the XLA flags that dump Mosaic/LLO output,
  the analog of --ptxas-options=-v register/SMEM dumps.
* ``kernel_cost_summary`` — analytic roofline estimate per attention call
  so CI can flag regressions without hardware counters.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

import jax

# v5e single-chip peaks (public spec); used for roofline estimates.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BW = 819e9


@contextlib.contextmanager
def trace(path: str) -> Iterator[None]:
    """Capture a jax.profiler trace under ``path``."""
    with jax.profiler.trace(path):
        yield


def mosaic_dump(dump_dir: str) -> None:
    """Enable XLA/Mosaic IR dumps for the rest of the process (set before
    the first compilation)."""
    existing = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{existing} --xla_dump_to={dump_dir}".strip()


def kernel_cost_summary(
    b: int,
    hq: int,
    nq: int,
    nkv: int,
    d: int,
    dv: int | None = None,
    *,
    causal: bool = False,
    direction: str = "fwd",
    itemsize: int = 2,
) -> dict:
    """Roofline estimate: FLOPs, HBM bytes, compute/memory-bound time."""
    from ..cli._flops import attention_flops

    dv = d if dv is None else dv
    flops = attention_flops(b, hq, nq, nkv, d, dv, causal=causal, direction=direction)
    io_bytes = (
        b * hq * nq * d  # q
        + b * hq * nkv * (d + dv)  # k, v (per-head upper bound)
        + b * hq * nq * dv  # o
    ) * itemsize
    if direction != "fwd":
        io_bytes *= 3
    t_compute = flops / PEAK_BF16_FLOPS
    t_memory = io_bytes / PEAK_HBM_BW
    return {
        "flops": flops,
        "hbm_bytes": io_bytes,
        "compute_bound_ms": t_compute * 1e3,
        "memory_bound_ms": t_memory * 1e3,
        "speed_of_light_ms": max(t_compute, t_memory) * 1e3,
        "bound": "compute" if t_compute >= t_memory else "memory",
    }
