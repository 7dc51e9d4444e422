"""Sweep the partial-head S-residency count m at N=16K self-attn backward.

The auto gate (ops/attention.py:_resident_head_count) picks m from the HBM
budget; this probe measures grad time at several forced budgets to find the
empirical best m and validate the reserve math. Forcing is done through the
same env knobs the gate reads (FFPA_TPU_SCORES_RESIDUAL_LIMIT_BYTES with
FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS=1), so the probe exercises the exact
production path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_16k_hybrid.py
"""
import os

os.environ.setdefault("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "1")

import jax
import jax.numpy as jnp

GIB = 1024 ** 3


def main():
    print(jax.devices(), flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dt = jnp.bfloat16
    nq = nkv = 16384
    d = 512
    q = jax.random.normal(ks[0], (1, 32, nq, d), dt)
    k = jax.random.normal(ks[1], (1, 32, nkv, d), dt)
    v = jax.random.normal(ks[2], (1, 32, nkv, d), dt)
    do = jax.random.normal(ks[3], (1, 32, nq, d), dt)

    from ffpa_attn_tpu.cli._bench import time_chained

    # (margin, scores_limit, ds_limit) matrix. Sweeping the scores limit
    # alone saturates: with the default 4 GiB model margin the headroom
    # gate binds budget at ~7.2 GiB (residents 4.8 GiB at 16K), so limits
    # of 8 and 10 GiB produce the SAME m — the margin is the real lever on
    # resident heads, and the dS limit is the lever on stripe count (fp32
    # dq-accumulator traffic scales with stripes).
    cases = [
        # (margin GiB, scores GiB, ds GiB, causal) — expected m in comment
        # NOTE: production DEFAULT at 16K is (margin 4, scores 8, ds 5)
        # (the hybrid m~11 row below); (4, 0, 5) is the handoff-ONLY
        # baseline with residency forced off.
        (4.0, 0.0, 5.0, False),   # handoff-only baseline (scores off)
        (4.0, 0.0, 7.0, False),   # handoff with coarser stripes (3 vs 4)
        (4.0, 4.0, 5.0, False),   # hybrid m~6
        (4.0, 8.0, 5.0, False),   # hybrid m~11 (headroom-bound)
        (0.0, 8.0, 5.0, False),   # hybrid m~13 (margin freed)
        (0.0, 10.0, 5.0, False),  # hybrid m~17 — OOM risk is data too
        (0.0, 0.0, 7.0, False),   # pure handoff, margin freed, coarse stripes
        (0.0, 6.0, 7.0, False),   # hybrid + coarse stripes
        # causal (the 1.41x row; VERDICT asks >= 1.5x): default vs the two
        # most promising levers above
        (4.0, 0.0, 5.0, True),
        (0.0, 8.0, 5.0, True),
        (0.0, 6.0, 7.0, True),
    ]
    for margin_gib, limit_gib, ds_gib, causal in cases:
        os.environ["FFPA_TPU_HBM_MODEL_MARGIN_BYTES"] = str(
            int(margin_gib * GIB)
        )
        os.environ["FFPA_TPU_DS_HANDOFF_LIMIT_BYTES"] = str(
            int(ds_gib * GIB)
        )
        os.environ["FFPA_TPU_SCORES_RESIDUAL_LIMIT_BYTES"] = str(
            int(limit_gib * GIB)
        )
        from ffpa_attn_tpu.interface import ffpa_attn_func
        from ffpa_attn_tpu.ops import attention as att

        class _S:
            backward_is_sdpa = False
            save_scores = None
            is_causal = causal
            dropout_p = 0.0
            fwd_config = None

        m = att._resident_head_count(_S, q, k, v, None)

        def step(q_, k_, v_, do_):
            def loss(q2, k2, v2):
                return (
                    ffpa_attn_func(q2, k2, v2, is_causal=causal)
                    .astype(jnp.float32)
                    * do_.astype(jnp.float32)
                ).sum()

            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
            return (
                dq,
                jnp.sum(dk.astype(jnp.float32))
                + jnp.sum(dv.astype(jnp.float32)),
            )

        try:
            t = time_chained(step, q, k, v, do, iters=3)
            print(
                f"margin={margin_gib:4.1f} scores={limit_gib:4.1f} "
                f"ds={ds_gib:3.1f} causal={int(causal)} -> m={m:2d}/32: "
                f"grad {t:.2f} ms",
                flush=True,
            )
        except Exception as exc:  # OOM at aggressive limits is data too
            print(
                f"margin={margin_gib:4.1f} scores={limit_gib:4.1f} "
                f"ds={ds_gib:3.1f} causal={int(causal)} -> m={m:2d}/32: "
                f"FAILED {str(exc)[:160]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
