"""Round-4 16K backward lever sweep: fp8 dS handoff x residency budgets.

VERDICT r3 item 1: 16K non-causal bwd is 0.90x (self) / 0.95x (gqa); the
declared levers — FFPA_TPU_ALLOW_FP8_DS (halves the handoff slab stream)
and margin/scores/ds budgets (resident-head fraction m, stripe count) —
were never measured on chip. This probe measures grad ms for the lever
matrix plus the XLA composite baseline per case, so each row prints an
estimated speedup directly.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/r4_probe_16k.py
"""
import os

os.environ.setdefault("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "1")

import jax
import jax.numpy as jnp

GIB = 1024 ** 3


def _case_inputs(hq, hkv, n, d=512):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (1, hq, n, d), dt)
    k = jax.random.normal(ks[1], (1, hkv, n, d), dt)
    v = jax.random.normal(ks[2], (1, hkv, n, d), dt)
    do = jax.random.normal(ks[3], (1, hq, n, d), dt)
    return q, k, v, do


def main():
    print(jax.devices(), flush=True)
    from ffpa_attn_tpu.cli._bench import (
        _grad_step,
        _sdpa_fwd_fn,
        _sdpa_variants,
        make_case,
        time_chained,
    )
    from ffpa_attn_tpu.interface import ffpa_attn_func
    from ffpa_attn_tpu.ops import attention as att

    def grad_step_ffpa(causal):
        def step(q_, k_, v_, do_):
            def loss(q2, k2, v2):
                return (
                    ffpa_attn_func(
                        q2, k2, v2, is_causal=causal,
                        enable_gqa=q2.shape[1] != k2.shape[1],
                    )
                    .astype(jnp.float32)
                    * do_.astype(jnp.float32)
                ).sum()

            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
            return dq, dk, dv

        return step

    # (label, bench-case-name, hq, hkv, causal)
    case_defs = {
        "self": ("self-attn", 32, 32, False),
        "gqa": ("gqa", 32, 8, False),
        "causal": ("causal", 32, 32, True),
    }
    # Optional case filter (e.g. FFPA_TPU_PROBE_CASES=gqa re-runs only the
    # rows the first pass lost to the pre-fix enable_gqa probe bug).
    only = os.environ.get("FFPA_TPU_PROBE_CASES")
    if only:
        keep = set(only.split(","))
        case_defs = {k: v for k, v in case_defs.items() if k in keep}

    base_ms = {}
    for label, (cname, hq, hkv, causal) in case_defs.items():
        case = make_case(cname, 1, 32, 16384, 512)
        q, k, v, do = _case_inputs(hq, hkv, 16384)
        best = float("inf")
        for var in _sdpa_variants(case):
            try:
                t = time_chained(
                    _grad_step(_sdpa_fwd_fn(case, var), False),
                    q, k, v, do, iters=3,
                )
                best = min(best, t)
            except Exception as exc:
                print(f"baseline {label}/{var} failed: {str(exc)[:120]}")
        base_ms[label] = best
        print(f"baseline {label}: grad {best:.2f} ms", flush=True)

    # (case, fp8, margin GiB, scores GiB, ds GiB)
    sweep = [
        # self-attn non-causal: the 0.90x lane
        ("self", 0, 4.0, 8.0, 5.0),   # production default (r3: 0.90x)
        ("self", 1, 4.0, 8.0, 5.0),   # + fp8 dS
        ("self", 1, 0.0, 8.0, 5.0),   # + margin freed (m~13)
        ("self", 1, 0.0, 10.0, 5.0),  # push residency
        ("self", 1, 0.0, 12.0, 5.0),  # push harder (OOM is data too)
        ("self", 1, 4.0, 0.0, 5.0),   # handoff-only + fp8
        ("self", 1, 0.0, 0.0, 7.0),   # handoff-only + fp8, coarse stripes
        ("self", 0, 0.0, 8.0, 5.0),   # margin freed WITHOUT fp8 (isolate)
        # gqa: the 0.95x lane
        ("gqa", 0, 4.0, 8.0, 5.0),
        ("gqa", 1, 4.0, 8.0, 5.0),
        ("gqa", 1, 0.0, 10.0, 5.0),
        # causal 16K (r3: 1.47x; check fp8 helps here too)
        ("causal", 0, 4.0, 8.0, 5.0),
        ("causal", 1, 4.0, 8.0, 5.0),
        ("causal", 1, 0.0, 10.0, 5.0),
    ]
    for label, fp8, margin_gib, limit_gib, ds_gib in sweep:
        if label not in case_defs:
            continue
        _, hq, hkv, causal = case_defs[label]
        q, k, v, do = _case_inputs(hq, hkv, 16384)
        os.environ["FFPA_TPU_ALLOW_FP8_DS"] = str(fp8)
        os.environ["FFPA_TPU_HBM_MODEL_MARGIN_BYTES"] = str(
            int(margin_gib * GIB)
        )
        os.environ["FFPA_TPU_DS_HANDOFF_LIMIT_BYTES"] = str(int(ds_gib * GIB))
        os.environ["FFPA_TPU_SCORES_RESIDUAL_LIMIT_BYTES"] = str(
            int(limit_gib * GIB)
        )

        class _S:
            backward_is_sdpa = False
            save_scores = None
            is_causal = causal
            dropout_p = 0.0
            fwd_config = None
            softcap = 0.0
            window = (-1, -1)
            has_alibi = False

        m = att._resident_head_count(_S, q, k, v, None)
        tag = (
            f"{label:6s} fp8={fp8} margin={margin_gib:3.1f} "
            f"scores={limit_gib:4.1f} ds={ds_gib:3.1f} m={m:2d}/{hq}"
        )
        try:
            t = time_chained(grad_step_ffpa(causal), q, k, v, do, iters=3)
            print(
                f"{tag}: grad {t:.2f} ms  est-speedup "
                f"{base_ms[label] / t:.2f}x",
                flush=True,
            )
        except Exception as exc:
            print(f"{tag}: FAILED {str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
