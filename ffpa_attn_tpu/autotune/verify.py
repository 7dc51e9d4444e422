"""Verify tool: persistent-lookup config vs fresh online-autotune winner.

Reference analog: bench/autotune/verify_persistent_autotune.py (353 LoC):
for each case, compare the stored config the lookup would pick against a
fresh timed search, reporting agreement and the perf delta.

Run: ``python -m ffpa_attn_tpu.autotune.verify --headdims 512 --seqlens 8192``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..logger import init_logger
from ..ops.dispatch import pick_forward_config
from .search import autotune_forward
from .store import lookup_tuned_config

logger = init_logger(__name__)


def verify_case(d: int, n: int, causal: bool, dtype_name: str, mode: str) -> dict:
    from ..ops.flash_fwd import flash_attention_forward

    dtype = jnp.dtype(dtype_name)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 8, n, d), dtype=dtype)
    k = jax.random.normal(kk, (1, 8, n, d), dtype=dtype)
    v = jax.random.normal(kv, (1, 8, n, d), dtype=dtype)
    scale = 1.0 / (d ** 0.5)

    stored = pick_forward_config(
        d=d, dv=d, nq=n, nkv=n, dtype=dtype, causal=causal, has_bias=False
    )
    fresh, fresh_ms = autotune_forward(
        q, k, v, None, scale=scale, is_causal=causal, mode=mode
    )

    def run_with(cfg):
        from ..cli._bench import time_chained

        def step(q_, k_, v_):
            return flash_attention_forward(
                q_, k_, v_, None, scale=scale, is_causal=causal, config=cfg
            )[0]

        return time_chained(step, q, k, v, iters=5)

    stored_ms = run_with(stored)
    agree = fresh is not None and stored == fresh
    result = {
        "d": d,
        "n": n,
        "causal": causal,
        "dtype": dtype_name,
        "stored_config": str(stored),
        "fresh_config": str(fresh),
        "stored_ms": stored_ms,
        "fresh_ms": fresh_ms,
        "agree": agree,
        "stored_vs_fresh": stored_ms / fresh_ms if fresh_ms else float("nan"),
    }
    logger.info(
        "verify d=%d n=%d causal=%s: stored %.2fms vs fresh %.2fms (%s)",
        d, n, causal, stored_ms, fresh_ms, "AGREE" if agree else "DIFFER",
    )
    return result


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m ffpa_attn_tpu.autotune.verify"
    )
    parser.add_argument("--headdims", type=int, nargs="*", default=[512])
    parser.add_argument("--seqlens", type=int, nargs="*", default=[8192])
    parser.add_argument("--dtypes", nargs="*", default=["bfloat16"])
    parser.add_argument("--mode", choices=["fast", "max"], default="fast")
    args = parser.parse_args(argv)

    worst = 1.0
    for d in args.headdims:
        for n in args.seqlens:
            for dtype in args.dtypes:
                for causal in (False, True):
                    res = verify_case(d, n, causal, dtype, args.mode)
                    worst = max(worst, res["stored_vs_fresh"])
    logger.info("worst stored/fresh ratio: %.3f", worst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
