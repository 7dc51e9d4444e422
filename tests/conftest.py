"""Test config: run on 8 virtual CPU devices so sharding tests work anywhere.

Pallas kernels run in interpret mode off-TPU (ops/flash_fwd.py:use_interpret).

With ``FFPA_TPU_RUN_DEVICE_TESTS=1`` the CPU pinning is skipped so the
attached TPU is visible: ``tests/test_on_device.py`` then compiles real
Mosaic kernels (the reference's tests run on its device tier; an
interpret-only suite would miss Mosaic lowering regressions). Everything
else still passes on the chip too, just slower — select the device lane
alone with ``-k on_device``.
"""

import os

if os.environ.get("FFPA_TPU_RUN_DEVICE_TESTS") != "1":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    # FORCE, don't setdefault: agent shells export JAX_PLATFORMS=axon, and
    # the axon sitecustomize additionally calls
    # jax.config.update("jax_platforms", "axon,cpu") at plugin
    # registration — with either in place the "hermetic" suite silently
    # ran REAL kernels on the attached chip (measured round 3 as suite
    # flakiness and 84s "interpret" compiles; the config.update below
    # wins because it runs after the plugin hook).
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if os.environ.get("FFPA_TPU_RUN_DEVICE_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
