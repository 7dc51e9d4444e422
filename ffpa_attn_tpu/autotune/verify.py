"""Verify tool: persistent-lookup config vs fresh online-autotune winner.

Reference analog: bench/autotune/verify_persistent_autotune.py (353 LoC):
for each case, compare the stored config the lookup would pick against a
fresh timed search, reporting agreement and the perf delta. The backward
direction additionally numerics-gates the stored config's dq against the
chunked fp32-softmax composite (a fast-but-wrong stored entry must never
survive verification).

Run: ``python -m ffpa_attn_tpu.autotune.verify --headdims 512 --seqlens 8192
--directions fwd bwd``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..logger import init_logger
from ..ops.dispatch import pick_backward_config, pick_forward_config
from .search import autotune_backward, autotune_forward
from .store import lookup_tuned_config

logger = init_logger(__name__)


def _rel(a, b):
    import numpy as np

    a = np.asarray(jax.device_get(a), np.float32)
    b = np.asarray(jax.device_get(b), np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def verify_case(
    d: int, n: int, causal: bool, dtype_name: str, mode: str,
    direction: str = "fwd",
) -> dict:
    from ..cli._bench import time_chained
    from ..ops.flash_bwd import flash_attention_backward
    from ..ops.flash_fwd import flash_attention_forward

    dtype = jnp.dtype(dtype_name)
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (1, 8, n, d), dtype=dtype)
    k = jax.random.normal(kk, (1, 8, n, d), dtype=dtype)
    v = jax.random.normal(kv, (1, 8, n, d), dtype=dtype)
    scale = 1.0 / (d ** 0.5)
    # Kernel-level calls below sit UNDER the interface's f16->bf16 compute
    # cast (Mosaic has no f16); mirror it here like the search does, keying
    # the store lookup and tolerance on the DECLARED dtype. The numerics
    # gate keeps the ORIGINAL declared-dtype arrays: the interface owns the
    # fp16 1e-2 contract machinery (precise_pv hi+lo split), so only a
    # through-the-interface run is held to that tolerance.
    from .search import _search_compute_dtype

    q0, k0, v0 = q, k, v
    q, k, v, was_f16 = _search_compute_dtype(q, k, v)

    if direction == "fwd":
        stored = pick_forward_config(
            d=d, dv=d, nq=n, nkv=n, dtype=dtype, causal=causal, has_bias=False
        )
        fresh, fresh_ms = autotune_forward(
            q, k, v, None, scale=scale, is_causal=causal, mode=mode
        )

        def run_with(cfg):
            def step(q_, k_, v_):
                return flash_attention_forward(
                    q_, k_, v_, None, scale=scale, is_causal=causal, config=cfg
                )[0]

            return time_chained(step, q, k, v, iters=5)

        numerics_rel = None
    else:
        do = jax.random.normal(kd, q.shape, dtype=dtype)
        stored = pick_backward_config(
            d=d, dv=d, nq=n, nkv=n, dtype=dtype, causal=causal, has_bias=False
        )
        fresh, fresh_ms = autotune_backward(
            q, k, v, None, scale=scale, is_causal=causal, mode=mode
        )
        # Time the stored config on the SAME execution scheme the fresh
        # search timed (autotune_backward): S-residency when the production
        # policy opts in, and the fp16 hi+lo dV split for f16 tasks —
        # otherwise stored_vs_fresh compares different backward schemes.
        from ..ops.attention import StaticArgs, _should_save_scores

        use_scores = _should_save_scores(
            StaticArgs(
                scale=scale, is_causal=causal, dropout_p=0.0,
                fwd_config=None, bwd_config=None, backward_is_sdpa=False,
                grad_kv_storage_dtype=None, grad_q_storage_dtype=None,
            ),
            q, k, v, None,
        )
        fwd_out = flash_attention_forward(
            q, k, v, None, scale=scale, is_causal=causal,
            return_scores=use_scores,
        )
        if use_scores:
            o, lse, scores = fwd_out
        else:
            (o, lse), scores = fwd_out, None

        def run_with(cfg):
            def step(q_, k_, v_, o_, lse_, do_, *maybe_scores):
                scores_ = maybe_scores[0] if maybe_scores else None
                dq, dk, dv_, _ = flash_attention_backward(
                    q_, k_, v_, None, o_, lse_, do_,
                    scale=scale, is_causal=causal, config=cfg,
                    scores=scores_, precise_pv=was_f16,
                )
                return dq, jnp.sum(dk.astype(jnp.float32)) + jnp.sum(
                    dv_.astype(jnp.float32)
                )

            rest = (k, v, o, lse, do) + ((scores,) if use_scores else ())
            return time_chained(step, q, *rest, iters=3)

        # Numerics gate: the STORED config's dq vs the chunked fp32-softmax
        # composite (same oracle the bench gate uses; k/v/do ride as traced
        # args — closure constants wedge remote compile).
        from ..cli._bench import _sdpa_fwd_fn, make_case

        vcase = make_case(
            "causal" if causal else "self-attn", 1, 8, n, d
        )
        composite = _sdpa_fwd_fn(vcase, "chunked")

        def dq_of(fwd_fn, q_, k_, v_, do_):
            def loss(q2, k2, v2, do2):
                return (
                    fwd_fn(q2, k2, v2, None).astype(jnp.float32)
                    * do2.astype(jnp.float32)
                ).sum()

            return jax.jit(jax.grad(loss))(q_, k_, v_, do_)

        def ffpa_fwd(q_, k_, v_, _m):
            # Default routing: dispatch resolves the SAME stored config via
            # pick_backward_config, so this gates exactly what production
            # will run for this variant key.
            from ..interface import ffpa_attn_func

            return ffpa_attn_func(q_, k_, v_, is_causal=causal)

        numerics_rel = _rel(
            dq_of(ffpa_fwd, q0, k0, v0, do),
            dq_of(composite, q0, k0, v0, do),
        )
        tol = 1e-2 if dtype == jnp.float16 else 5e-2
        if numerics_rel >= tol:
            raise RuntimeError(
                f"verify NUMERICS FAILED d={d} n={n} causal={causal} "
                f"{direction}: dq rel={numerics_rel:.3f} >= {tol}"
            )

    stored_ms = run_with(stored)
    agree = fresh is not None and stored == fresh
    result = {
        "d": d,
        "n": n,
        "causal": causal,
        "dtype": dtype_name,
        "direction": direction,
        "stored_config": str(stored),
        "fresh_config": str(fresh),
        "stored_ms": stored_ms,
        "fresh_ms": fresh_ms,
        "agree": agree,
        "stored_vs_fresh": stored_ms / fresh_ms if fresh_ms else float("nan"),
        "numerics_rel": numerics_rel,
    }
    logger.info(
        "verify %s d=%d n=%d causal=%s: stored %.2fms vs fresh %.2fms (%s)%s",
        direction, d, n, causal, stored_ms, fresh_ms,
        "AGREE" if agree else "DIFFER",
        "" if numerics_rel is None else f" dq_rel={numerics_rel:.4f}",
    )
    return result


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m ffpa_attn_tpu.autotune.verify"
    )
    parser.add_argument("--headdims", type=int, nargs="*", default=[512])
    parser.add_argument("--seqlens", type=int, nargs="*", default=[8192])
    parser.add_argument("--dtypes", nargs="*", default=["bfloat16"])
    parser.add_argument(
        "--directions", nargs="*", default=["fwd"], choices=["fwd", "bwd"]
    )
    parser.add_argument("--mode", choices=["fast", "max"], default="fast")
    args = parser.parse_args(argv)

    worst = 1.0
    for d in args.headdims:
        for n in args.seqlens:
            for dtype in args.dtypes:
                for direction in args.directions:
                    for causal in (False, True):
                        res = verify_case(
                            d, n, causal, dtype, args.mode, direction
                        )
                        worst = max(worst, res["stored_vs_fresh"])
    logger.info("worst stored/fresh ratio: %.3f", worst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
