#!/usr/bin/env python
"""Per-launch backward block-shape sweep on the attached TPU.

Times the dK/dV launch and the dQ launch in isolation (run_dkdv/run_dq
flags) so each gets its own optimum — the two launches have different
owner/streamed roles and need not share shapes.
"""

from __future__ import annotations

import argparse
import itertools
import json

import jax
import jax.numpy as jnp

from ffpa_attn_tpu.cli._bench import time_chained
from ffpa_attn_tpu.ops.config import (
    BlockConfig,
    bwd_dkdv_vmem_bytes,
    bwd_dq_vmem_bytes,
)
from ffpa_attn_tpu.env import ENV
from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--H", type=int, default=32)
    ap.add_argument("--N", type=int, default=8192)
    ap.add_argument("--D", type=int, default=512)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--launch", choices=["dkdv", "dq", "both"], default="both")
    args = ap.parse_args()

    b, h, n, d = args.B, args.H, args.N, args.D
    scale = 1.0 / d**0.5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, n, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, h, n, d), jnp.bfloat16)
    o, lse = jax.jit(
        lambda q_, k_, v_: flash_attention_forward(
            q_, k_, v_, None, scale=scale, is_causal=args.causal
        )
    )(q, k, v)
    jax.block_until_ready(o)

    limit = ENV.vmem_limit_bytes()
    itemsize = 2

    results = {}
    if args.launch in ("dkdv", "both"):
        rows = []
        for bq, bkv in itertools.product(
            (256, 512, 1024, 2048), (128, 256, 512, 1024)
        ):
            cfg = BlockConfig(block_q_dkdv=bq, block_kv_dkdv=bkv).clamp(n, n)
            if bwd_dkdv_vmem_bytes(cfg, d, d, itemsize, False) > limit:
                continue

            def step(k_, q_, v_, o_, lse_, do_, cfg=cfg):
                _, dk, dvv, _ = flash_attention_backward(
                    q_, k_, v_, None, o_, lse_, do_,
                    scale=scale, is_causal=args.causal, config=cfg,
                    run_dq=False,
                )
                return dk, jnp.sum(dvv.astype(jnp.float32))

            try:
                ms = time_chained(step, k, q, v, o, lse, do, iters=args.iters)
            except Exception as exc:
                print(f"dkdv bq={bq} bkv={bkv}: FAIL {str(exc)[:120]}", flush=True)
                continue
            print(f"dkdv bq={bq} bkv={bkv}: {ms:.2f} ms", flush=True)
            rows.append({"bq": bq, "bkv": bkv, "ms": ms})
        results["dkdv"] = sorted(rows, key=lambda r: r["ms"])

    if args.launch in ("dq", "both"):
        rows = []
        for bq, bkv in itertools.product(
            (128, 256, 512, 1024, 2048), (256, 512, 1024)
        ):
            cfg = BlockConfig(block_q_dq=bq, block_kv_dq=bkv).clamp(n, n)
            if bwd_dq_vmem_bytes(cfg, d, d, itemsize, False) > limit:
                continue

            def step(q_, k_, v_, o_, lse_, do_, cfg=cfg):
                dq, _, _, _ = flash_attention_backward(
                    q_, k_, v_, None, o_, lse_, do_,
                    scale=scale, is_causal=args.causal, config=cfg,
                    run_dkdv=False,
                )
                return dq

            try:
                ms = time_chained(step, q, k, v, o, lse, do, iters=args.iters)
            except Exception as exc:
                print(f"dq bq={bq} bkv={bkv}: FAIL {str(exc)[:120]}", flush=True)
                continue
            print(f"dq bq={bq} bkv={bkv}: {ms:.2f} ms", flush=True)
            rows.append({"bq": bq, "bkv": bkv, "ms": ms})
        results["dq"] = sorted(rows, key=lambda r: r["ms"])

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
