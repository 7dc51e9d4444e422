"""Probe the S-resident backward on-chip vs the handoff path and vs the
bench baseline protocol (grad-minus-fwd), at the weak VERDICT shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_sres.py
"""
import jax
import jax.numpy as jnp

from ffpa_attn_tpu.cli._bench import time_chained
from ffpa_attn_tpu.functional import PallasBackend
from ffpa_attn_tpu.interface import ffpa_attn_func


def case(b, hq, hkv, nq, nkv, d, causal):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (b, hq, nq, d), dt)
    k = jax.random.normal(ks[1], (b, hkv, nkv, d), dt)
    v = jax.random.normal(ks[2], (b, hkv, nkv, d), dt)
    do = jax.random.normal(ks[3], (b, hq, nq, d), dt)
    gqa = hq != hkv
    label = f"B{b} Hq{hq} Hkv{hkv} {nq}x{nkv} D{d} causal={causal}"

    def fwd_of(be):
        def fwd(q_, k_, v_):
            return ffpa_attn_func(
                q_, k_, v_, is_causal=causal, enable_gqa=gqa,
                backward_backend=be,
            )
        return fwd

    def grad_step(be):
        fwd = fwd_of(be)

        def step(q_, k_, v_, do_):
            def loss(q2, k2, v2):
                return (fwd(q2, k2, v2).astype(jnp.float32)
                        * do_.astype(jnp.float32)).sum()
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
            extra = jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv.astype(jnp.float32))
            return dq, extra
        return step

    t_fwd = time_chained(lambda q_, k_, v_: fwd_of(None)(q_, k_, v_),
                         q, k, v, iters=4)
    print(f"[{label}] fwd: {t_fwd:.2f} ms", flush=True)
    for name, be in (
        ("sres", PallasBackend(save_scores=True)),
        ("handoff", PallasBackend(save_scores=False)),
    ):
        try:
            t_grad = time_chained(grad_step(be), q, k, v, do, iters=4)
            print(f"[{label}] grad {name}: {t_grad:.2f} ms "
                  f"-> bwd {t_grad - t_fwd:.2f} ms", flush=True)
        except Exception as e:
            print(f"[{label}] grad {name}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    case(1, 32, 32, 1024, 8192, 512, False)   # cross-attn (0.90x, baseline 7.62)
    case(1, 32, 32, 8192, 8192, 512, False)   # headline (1.34x, baseline 81.07)
    case(1, 32, 32, 8192, 8192, 512, True)    # causal (1.91x, baseline 78.34)
    case(1, 32, 32, 8192, 8192, 1024, False)  # D=1024 (0.96x, baseline 115.27)
    case(1, 32, 8, 8192, 8192, 512, False)    # gqa (1.26x, baseline 77.12)
