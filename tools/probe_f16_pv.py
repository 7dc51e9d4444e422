"""fp16 dV-precision contract table: hilo vs psplit vs plain.

Runs the REAL backward kernels (interpret mode off-TPU) at test shapes and
reports each gradient's worst err/tol ratio against the fp32 oracle under
the fp16 contract (atol=rtol=1e-2, reference tests/test_ffpa_bwd.py:43-46).
A ratio < 1 passes; the shipped default is the cheapest passing mode with
>= 3x margin (ratio < 0.33), since one distribution sample is not a proof.

Run (CPU): python tools/probe_f16_pv.py
Run (chip, adds timing): PYTHONPATH=/root/repo:/root/.axon_site \
    FFPA_TPU_PV_TIME=1 python tools/probe_f16_pv.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if not os.environ.get("FFPA_TPU_PV_TIME"):
    # Contract pass runs the kernels in interpret mode on CPU.
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

if not os.environ.get("FFPA_TPU_PV_TIME"):
    # The axon sitecustomize calls jax.config.update("jax_platforms",
    # "axon,cpu") at plugin registration, overriding the env var — force
    # CPU the same way tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def run(mode, shapes, time_it=False):
    os.environ["FFPA_TPU_F16_PV_MODE"] = mode
    # env is read at trace time; bust jit caches between modes.
    jax.clear_caches()
    from ffpa_attn_tpu.interface import ffpa_attn_func
    from ffpa_attn_tpu.ops.reference import reference_attention

    for (b, h, n, d, causal) in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(ks[0], (b, h, n, d), jnp.float16)
        k = jax.random.normal(ks[1], (b, h, n, d), jnp.float16)
        v = jax.random.normal(ks[2], (b, h, n, d), jnp.float16)
        do = jax.random.normal(ks[3], (b, h, n, d), jnp.float16)

        def loss(fn, a, b_, c):
            return (
                fn(a, b_, c).astype(jnp.float32) * do.astype(jnp.float32)
            ).sum()

        g = jax.grad(
            lambda a, b_, c: loss(
                lambda *t: ffpa_attn_func(*t, is_causal=causal), a, b_, c
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        gr = jax.grad(
            lambda a, b_, c: loss(
                lambda *t: reference_attention(
                    *t, None, is_causal=causal, scale=d**-0.5
                ),
                a, b_, c,
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        ratios = []
        for x, y in zip(g, gr):
            x = np.asarray(jax.device_get(x), np.float32)
            y = np.asarray(jax.device_get(y), np.float32)
            tol = 1e-2 + 1e-2 * np.abs(y)
            ratios.append(float((np.abs(x - y) / tol).max()))
        line = (
            f"{mode:7s} B{b} H{h} N{n} D{d} causal={int(causal)}: "
            f"err/tol dq {ratios[0]:.3f} dk {ratios[1]:.3f} dv {ratios[2]:.3f}"
        )
        if time_it:
            from ffpa_attn_tpu.cli._bench import _grad_step, time_chained

            def fwd_fn(q_, k_, v_, mask):
                return ffpa_attn_func(q_, k_, v_, is_causal=causal)

            t_grad = time_chained(_grad_step(fwd_fn, False), q, k, v, do,
                                  iters=10)
            t_fwd = time_chained(
                lambda q_, k_, v_: fwd_fn(q_, k_, v_, None), q, k, v,
                iters=10,
            )
            line += f"  bwd {t_grad - t_fwd:.2f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    time_it = bool(os.environ.get("FFPA_TPU_PV_TIME"))
    if time_it:
        shapes = [(1, 32, 8192, 512, False)]
    else:
        shapes = [
            (1, 4, 2048, 512, False),
            (1, 4, 2048, 512, True),
            (1, 2, 2048, 320, False),
            (2, 2, 1024, 640, False),
        ]
    print(jax.devices(), flush=True)
    for mode in ("hilo", "psplit", "plain"):
        run(mode, shapes, time_it=time_it)
