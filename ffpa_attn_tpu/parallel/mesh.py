"""Mesh construction helpers."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str]) -> Mesh:
    """Build a Mesh over the available devices.

    Example: ``make_mesh((2, 4), ("dp", "sp"))`` on an 8-device host.
    """
    n = int(np.prod(axis_sizes))
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    return Mesh(np.array(devices).reshape(*axis_sizes), tuple(axis_names))
