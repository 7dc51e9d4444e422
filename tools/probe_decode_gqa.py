"""Measure PackGQA decode: achieved HBM bandwidth at GQA serving shapes.

The kernel is bandwidth-bound; PackGQA means K/V stream once per KV head,
so the roofline traffic is Hkv*(Nkv*(D+Dv))*itemsize per step (plus Q/O
noise). Pre-fold, traffic was Hq-scaled: group x more.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_decode_gqa.py
"""
import jax
import jax.numpy as jnp

from ffpa_attn_tpu.cli._bench import time_chained
from ffpa_attn_tpu.interface import ffpa_attn_func


def case(hq, hkv, nkv, d, nq=1):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (1, hq, nq, d), dt)
    k = jax.random.normal(ks[1], (1, hkv, nkv, d), dt)
    v = jax.random.normal(ks[2], (1, hkv, nkv, d), dt)

    def step(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, enable_gqa=hq != hkv)

    ms = time_chained(step, q, k, v, iters=32)
    kv_bytes = 2 * hkv * nkv * d * 2
    gbps = kv_bytes / (ms * 1e-3) / 1e9
    eff = gbps / 819
    print(
        f"decode Hq{hq}/Hkv{hkv} Nq{nq} Nkv{nkv} D{d}: {ms:.3f} ms, "
        f"KV traffic {gbps:.0f} GB/s ({eff*100:.0f}% of HBM peak), "
        f"{1000.0/ms:.0f} tok/s", flush=True,
    )


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    case(32, 32, 8192, 512)   # MHA baseline (r1: 754 GB/s)
    case(32, 8, 8192, 512)    # 4:1 GQA — the VERDICT target shape
    case(32, 4, 8192, 512)    # 8:1 GQA
    case(32, 8, 8192, 512, nq=4)  # speculative + GQA
