"""Round-2 probe: calibrate MXU peak + break down bwd time at weak shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_bwd_r2.py
"""
import time

import jax
import jax.numpy as jnp

from ffpa_attn_tpu.cli._bench import time_chained
from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward


def matmul_peak():
    # Big bf16 matmul at MXU-friendly shape to calibrate true peak.
    for m, k, n in ((8192, 8192, 8192), (16384, 8192, 8192)):
        a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        bmat = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

        def step(a_, b_=bmat):
            return jnp.dot(a_, b_).astype(jnp.bfloat16) @ b_.T

        ms = time_chained(step, a, iters=8)
        flops = 2 * 2 * m * k * n
        print(f"matmul {m}x{k}x{n} x2: {ms:.2f} ms -> {flops/ms/1e9:.1f} TFLOPS", flush=True)


def bwd_components(b, hq, hkv, nq, nkv, d, causal):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (b, hq, nq, d), dt)
    k = jax.random.normal(ks[1], (b, hkv, nkv, d), dt)
    v = jax.random.normal(ks[2], (b, hkv, nkv, d), dt)
    do = jax.random.normal(ks[3], (b, hq, nq, d), dt)
    scale = d ** -0.5
    o, lse = jax.jit(
        lambda q_, k_, v_: flash_attention_forward(
            q_, k_, v_, None, scale=scale, is_causal=causal)
    )(q, k, v)
    o.block_until_ready()

    label = f"B{b} Hq{hq} Hkv{hkv} {nq}x{nkv} D{d} causal={causal}"

    def run(name, **kw):
        def step(q_, k_, v_, o_, lse_, do_):
            dq, dk, dv, _ = flash_attention_backward(
                q_, k_, v_, None, o_, lse_, do_,
                scale=scale, is_causal=causal, **kw)
            extra = jnp.zeros((), jnp.float32)
            for g in (dk, dv):
                if g is not None:
                    extra = extra + jnp.sum(g.astype(jnp.float32))
            out = dq if dq is not None else dk
            if out.shape != q_.shape:
                return q_ + 0, extra  # shape mismatch guard
            return out.astype(q_.dtype), extra

        try:
            ms = time_chained(step, q, k, v, o, lse, do, iters=4)
            print(f"  [{label}] {name}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"  [{label}] {name}: FAILED {str(e)[:200]}", flush=True)

    run("full handoff", ds_handoff=True)
    run("full no-handoff", ds_handoff=False)
    run("dkdv only (no handoff)", ds_handoff=False, run_dq=False)
    run("dq only (no handoff)", ds_handoff=False, run_dkdv=False)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    matmul_peak()
    # the weak rows
    bwd_components(1, 32, 32, 1024, 8192, 512, False)   # cross-attn 0.90x
    bwd_components(1, 32, 32, 8192, 8192, 1024, False)  # D=1024 0.96x
    bwd_components(1, 32, 32, 16384, 16384, 512, False)  # 16K self 0.85x
    bwd_components(1, 32, 32, 16384, 16384, 512, True)   # 16K causal 0.97x
    bwd_components(1, 32, 32, 8192, 8192, 512, True)     # causal 8K (1.91x, low eff)
