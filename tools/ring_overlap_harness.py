"""Ring-attention comm/compute overlap harness (CPU mesh).

VERDICT round-2 ask #8: give the >=85% 2-host scaling projection an
execution footing. Runs the sequence-sharded ring fwd+bwd on an 8-device
CPU mesh and reports three measurements per direction:

* ``ring``     — the real ring step (kernels + ppermute rotations);
* ``no_comm``  — the same program with every ppermute replaced by
  identity (pure compute, same kernel count and schedule);
* ``overlap``  — no_comm / ring: the fraction of the real step spent on
  work the rotations did NOT serialize. 1.0 means every hop fully
  hidden; the gap bounds the comm exposure on this transport.

CPU host "ICI" is a memcpy, so the absolute exposure is not v5e's — the
point is the SCHEDULE: with prefetch-rotation issued before the kernels
(parallel/ring.py), exposure stays near zero even though the CPU
transport is slow relative to its compute; a serialized schedule shows
up immediately as overlap << 1.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/ring_overlap_harness.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import time
from unittest import mock

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ffpa_attn_tpu.parallel import ring


def _time_ms(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def main():
    devices = jax.devices()
    assert len(devices) >= 8, devices
    mesh = Mesh(devices[:8], ("sp",))
    b, h, n, d = 1, 4, 4096, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, n, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, h, n, d), jnp.bfloat16)

    def fwd(q_, k_, v_):
        return ring.ring_attention_sharded(q_, k_, v_, mesh, causal=True)

    def bwd(q_, k_, v_, do_):
        def loss(q2, k2, v2):
            return (
                fwd(q2, k2, v2).astype(jnp.float32)
                * do_.astype(jnp.float32)
            ).sum()

        return jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)

    results = {}
    for name, fn, args in (
        ("fwd", jax.jit(fwd), (q, k, v)),
        ("fwd+bwd", jax.jit(bwd), (q, k, v, do)),
    ):
        t_ring = _time_ms(fn, *args)
        # Identity "rotation": same kernels, no comm. jit retraces because
        # the patched _rotate changes the traced graph.
        with mock.patch.object(ring, "_rotate", lambda x, *_a, **_k: x):
            if name == "fwd":
                fn_nc = jax.jit(lambda q_, k_, v_: ring.ring_attention_sharded(
                    q_, k_, v_, mesh, causal=True))
                t_nc = _time_ms(fn_nc, *args)
            else:
                def bwd_nc(q_, k_, v_, do_):
                    def loss(q2, k2, v2):
                        return (
                            ring.ring_attention_sharded(
                                q2, k2, v2, mesh, causal=True
                            ).astype(jnp.float32)
                            * do_.astype(jnp.float32)
                        ).sum()

                    return jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)

                t_nc = _time_ms(jax.jit(bwd_nc), *args)
        results[name] = (t_ring, t_nc, t_nc / t_ring)
        print(
            f"{name:8s} ring {t_ring:8.1f} ms | no-comm {t_nc:8.1f} ms | "
            f"overlap {t_nc / t_ring:.3f}",
            flush=True,
        )
    return results


if __name__ == "__main__":
    main()
