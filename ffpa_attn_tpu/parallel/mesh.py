"""Mesh construction + multi-host runtime bootstrap.

The reference's only multi-device component is the Ray autotune pool
(reference: src/ffpa_attn/ray/_autotune_engine.py); compute-side
distribution is new in the TPU build (SURVEY.md §2.8). This module owns:

* ``initialize_distributed`` — the ``jax.distributed.initialize`` bootstrap
  for multi-host slices (one process per host; coordinator picked from env
  or args).
* ``make_mesh`` — topology-aware device meshes via
  ``jax.experimental.mesh_utils.create_device_mesh`` so the ring (sp) axis
  follows ICI adjacency; a naive ``jax.devices()`` reshape gives a ring
  whose ppermute hops cross the torus diagonally.

Multi-host recipe (2 hosts x 4 chips, dp x sp):

    # host 0                                 # host 1
    initialize_distributed(                  initialize_distributed(
        coordinator="host0:8476",                coordinator="host0:8476",
        num_processes=2, process_id=0)           num_processes=2, process_id=1)
    mesh = make_mesh((2, 4), ("dp", "sp"))   mesh = make_mesh((2, 4), ("dp", "sp"))

then build the train step with ``models.make_train_step(cfg, opt, mesh,
sp_axis="sp")`` — the ring's ppermute rides ICI within each host and DCN
only where the sp axis crosses hosts (keep sp within a host when the
topology allows: put the host-crossing axis on dp, whose all-reduce is
bandwidth-friendly).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap the multi-host JAX runtime (idempotent).

    Args default from the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); on single-host (nothing
    set) this is a no-op so library code can call it unconditionally.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single-host
    kwargs = {"coordinator_address": coordinator}
    num_processes = num_processes or _env_opt_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_opt_int(
        "JAX_PROCESS_ID"
    )
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:  # already initialized
        if "already" not in str(exc).lower():
            raise


def _env_opt_int(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val else None


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str],
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a topology-aware Mesh over the available devices.

    Uses ``mesh_utils.create_device_mesh`` when the requested mesh covers
    every device — it orders devices so the LAST axis is ICI-adjacent
    (ring-friendly for the sp ppermute rotation; SURVEY.md §7 step 7).
    Falls back to a plain reshape for partial meshes or host-only tests.

    Example: ``make_mesh((2, 4), ("dp", "sp"))`` on an 8-device host.
    """
    n = int(np.prod(axis_sizes))
    pool = list(devices) if devices is not None else jax.devices()
    if len(pool) < n:
        raise ValueError(
            f"mesh needs {n} devices, only {len(pool)} available"
        )
    if devices is None and n == len(pool):
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(tuple(axis_sizes))
            return Mesh(arr, tuple(axis_names))
        except Exception:
            pass  # non-TPU platforms / unusual topologies: plain reshape
    return Mesh(np.array(pool[:n]).reshape(*axis_sizes), tuple(axis_names))
