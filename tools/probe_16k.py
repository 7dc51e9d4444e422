"""Probe 16K backward after stripe row-slicing + clamped dS writes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_16k.py
"""
import jax
import jax.numpy as jnp

from ffpa_attn_tpu.cli._bench import time_chained
from ffpa_attn_tpu.interface import ffpa_attn_func


def case(nq, nkv, d, causal):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (1, 32, nq, d), dt)
    k = jax.random.normal(ks[1], (1, 32, nkv, d), dt)
    v = jax.random.normal(ks[2], (1, 32, nkv, d), dt)
    do = jax.random.normal(ks[3], (1, 32, nq, d), dt)
    label = f"{nq}x{nkv} D{d} causal={causal}"

    def fwd(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, is_causal=causal)

    def step(q_, k_, v_, do_):
        def loss(q2, k2, v2):
            return (fwd(q2, k2, v2).astype(jnp.float32)
                    * do_.astype(jnp.float32)).sum()
        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
        extra = jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv.astype(jnp.float32))
        return dq, extra

    t_fwd = time_chained(fwd, q, k, v, iters=3)
    t_grad = time_chained(step, q, k, v, do, iters=3)
    print(f"[{label}] fwd {t_fwd:.2f} ms | grad {t_grad:.2f} -> "
          f"bwd {t_grad - t_fwd:.2f} ms", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    case(16384, 16384, 512, True)   # was 182.45 (0.97x, baseline 176.18)
    case(16384, 16384, 512, False)  # was 253.84 (0.85x, baseline 216.52)
