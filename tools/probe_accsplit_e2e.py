"""Does the accumulator-split crossover winner land END-TO-END?

VERDICT r4 weak #3: the sweep says dkdv_dk_in_kernel=False 256x1024 wins
non-causal D=640/768 bwd by ~20% (docs/bench_accsplit_crossover.md), yet
the benched multiD number didn't move. This probe times BOTH families at
the exact bench key under the exact bench protocol (jax.grad step,
materializing carries, fwd subtraction) by pinning the backward config —
separating "dispatch serves the wrong entry" from "the bench protocol's
fixed costs (S-slab write, grad carries) ride on top of both".

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_accsplit_e2e.py
"""
import jax
import jax.numpy as jnp

from ffpa_attn_tpu.cli._bench import _grad_step, time_chained
from ffpa_attn_tpu.interface import ffpa_attn_func
from ffpa_attn_tpu.ops.config import BlockConfig

WINNER = BlockConfig(
    block_q=256, block_kv=512, block_q_dkdv=256, block_kv_dkdv=1024,
    block_q_dq=256, block_kv_dq=1024, dkdv_dk_in_kernel=False,
)
RUNNER_UP = BlockConfig(
    block_q=256, block_kv=512, block_q_dkdv=512, block_kv_dkdv=512,
    block_q_dq=512, block_kv_dq=512, dkdv_dk_in_kernel=True,
)


def run(d, cfg_map):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (1, 32, 8192, d), dt)
    k = jax.random.normal(ks[1], (1, 32, 8192, d), dt)
    v = jax.random.normal(ks[2], (1, 32, 8192, d), dt)
    do = jax.random.normal(ks[3], (1, 32, 8192, d), dt)

    import ffpa_attn_tpu.ops.dispatch as dispatch

    orig = dispatch.pick_backward_config
    for name, cfg in cfg_map.items():
        dispatch.pick_backward_config = (
            orig if cfg is None else (lambda _c=cfg, **kw: _c)
        )
        try:
            def fwd_fn(q_, k_, v_, mask):
                return ffpa_attn_func(q_, k_, v_)

            t_grad = time_chained(
                _grad_step(fwd_fn, False), q, k, v, do, iters=10
            )
            t_fwd = time_chained(
                lambda q_, k_, v_: fwd_fn(q_, k_, v_, None), q, k, v,
                iters=10,
            )
            print(
                f"D{d} non-causal bwd [{name}]: grad {t_grad:.2f} ms  "
                f"fwd {t_fwd:.2f} ms  bwd {t_grad - t_fwd:.2f} ms",
                flush=True,
            )
        finally:
            dispatch.pick_backward_config = orig


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    for d in (640, 768):
        run(d, {"stored/dispatch": None, "winner-pinned": WINNER,
                "in-kernel-dK": RUNNER_UP})
