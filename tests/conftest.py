"""Test config: run on 8 virtual CPU devices so sharding tests work anywhere.

Pallas kernels run in interpret mode off-TPU (ops/flash_fwd.py:use_interpret).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_threefry_partitionable", True)
