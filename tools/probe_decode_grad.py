"""Decompose the decode-bwd bench number: grad-total vs fwd vs fwd+scores.

The bench reports t_grad - t_fwd; the from-S composite is 1.61 ms isolated
(parity with SDPA's 1.63) yet benched 2.01. Measure each program.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_decode_grad.py
"""
import jax
import jax.numpy as jnp

from ffpa_attn_tpu.cli._bench import time_chained
from ffpa_attn_tpu.interface import ffpa_attn_func
from ffpa_attn_tpu.ops.decode import _decode_forward


def main(hq=32, hkv=32, nkv=8192, d=512):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (1, hq, 1, d), dt)
    k = jax.random.normal(ks[1], (1, hkv, nkv, d), dt)
    v = jax.random.normal(ks[2], (1, hkv, nkv, d), dt)
    do = jax.random.normal(ks[3], (1, hq, 1, d), dt)
    gqa = hq != hkv

    def fwd(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, enable_gqa=gqa)

    def fwd_scores(q_, k_, v_):
        o, lse, s = _decode_forward(
            q_, k_, v_, None, scale=d**-0.5, is_causal=False,
            return_scores=True,
        )
        # keep scores alive via a cheap but non-DCE-able data dependence
        return o + s[:, :, :1, :1].astype(o.dtype) * 0

    def grad_step(q_, k_, v_, do_):
        def loss(a, b_, c):
            return (
                fwd(a, b_, c).astype(jnp.float32) * do_.astype(jnp.float32)
            ).sum()

        return jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)

    t_fwd = time_chained(fwd, q, k, v, iters=32)
    t_fwd_s = time_chained(fwd_scores, q, k, v, iters=32)
    t_grad = time_chained(grad_step, q, k, v, do, iters=32)
    print(
        f"Hq{hq}/Hkv{hkv} Nkv{nkv} D{d}: fwd {t_fwd:.3f}  fwd+scores "
        f"{t_fwd_s:.3f}  grad {t_grad:.3f}  grad-fwd {t_grad - t_fwd:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
    main(32, 8, 8192, 512)
