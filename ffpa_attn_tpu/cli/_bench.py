"""Benchmark CLI: the 8 reference cases vs XLA SDPA.

Mirrors ``python -m ffpa_attn.bench`` (reference: src/ffpa_attn/cli/_bench.py):
cases self-attn / cross-attn / decode / gqa / causal / attn-mask / dropout /
non-aligned, fwd and bwd directions, wall-clock warmup+iters timing, exact
causal-pair TFLOPS model, markdown table output. The SDPA baseline is the
fp32-reference einsum chain compiled by XLA (what a JAX user gets today),
plus ``jax.nn.dot_product_attention`` where applicable.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..interface import ffpa_attn_func
from ..ops.reference import expand_kv_heads, reference_attention
from ._flops import attention_flops, format_tflops, tflops_from_ms

CASES = (
    "self-attn",
    "cross-attn",
    "decode",
    "gqa",
    "causal",
    "attn-mask",
    "dropout",
    "non-aligned",
)


@dataclass
class BenchCase:
    name: str
    b: int
    hq: int
    hkv: int
    nq: int
    nkv: int
    d: int
    causal: bool = False
    mask: bool = False
    dropout_p: float = 0.0


def make_case(name: str, b: int, h: int, n: int, d: int) -> BenchCase:
    if name == "self-attn":
        return BenchCase(name, b, h, h, n, n, d)
    if name == "cross-attn":
        return BenchCase(name, b, h, h, max(n // 8, 128), n, d)
    if name == "decode":
        return BenchCase(name, b, h, h, 1, n, d)
    if name == "gqa":
        return BenchCase(name, b, h, max(h // 4, 1), n, n, d)
    if name == "causal":
        return BenchCase(name, b, h, h, n, n, d, causal=True)
    if name == "attn-mask":
        return BenchCase(name, b, h, h, n, n, d, mask=True)
    if name == "dropout":
        return BenchCase(name, b, h, h, n, n, d, dropout_p=0.1)
    if name == "non-aligned":
        return BenchCase(name, b, h, h, n - 1, n - 1, d)
    raise ValueError(name)


def _inputs(case: BenchCase, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (case.b, case.hq, case.nq, case.d), dtype=dtype)
    k = jax.random.normal(ks[1], (case.b, case.hkv, case.nkv, case.d), dtype=dtype)
    v = jax.random.normal(ks[2], (case.b, case.hkv, case.nkv, case.d), dtype=dtype)
    mask = None
    if case.mask:
        mask = jax.random.normal(
            ks[3], (case.b, case.hq, case.nq, case.nkv), dtype=jnp.float32
        )
    do = jax.random.normal(ks[4], q.shape[:-1] + (case.d,), dtype=dtype)
    return q, k, v, mask, do


def time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Wall-clock ms/iter with block_until_ready (reference runners use
    warmup=2 iters=10, cli/_runner_fwd.py)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _ffpa_fwd_fn(case: BenchCase, backend: Optional[str]):
    kwargs = {}
    if backend:
        kwargs["backend"] = backend

    @jax.jit
    def fn(q, k, v, mask):
        return ffpa_attn_func(
            q,
            k,
            v,
            attn_mask=mask,
            is_causal=case.causal,
            dropout_p=case.dropout_p,
            enable_gqa=case.hq != case.hkv,
            **kwargs,
        )

    return fn


def _sdpa_fwd_fn(case: BenchCase):
    hq = case.hq

    @jax.jit
    def fn(q, k, v, mask):
        return reference_attention(
            q,
            expand_kv_heads(k, hq),
            expand_kv_heads(v, hq),
            mask,
            is_causal=case.causal,
            dropout_p=case.dropout_p,
        )

    return fn


def _grad_fn(fwd_fn):
    @jax.jit
    def fn(q, k, v, mask, do):
        def loss(q_, k_, v_):
            return (fwd_fn.__wrapped__(q_, k_, v_, mask) * do).sum()

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    return fn


def run_case(
    case: BenchCase,
    dtype,
    direction: str,
    backend: Optional[str] = None,
    warmup: int = 2,
    iters: int = 10,
):
    q, k, v, mask, do = _inputs(case, dtype)
    ffpa_fwd = _ffpa_fwd_fn(case, backend)
    sdpa_fwd = _sdpa_fwd_fn(case)

    if direction == "fwd":
        t_ffpa = time_fn(ffpa_fwd, q, k, v, mask, warmup=warmup, iters=iters)
        t_sdpa = time_fn(sdpa_fwd, q, k, v, mask, warmup=warmup, iters=iters)
    else:
        t_ffpa = time_fn(
            _grad_fn(ffpa_fwd), q, k, v, mask, do, warmup=warmup, iters=iters
        )
        t_sdpa = time_fn(
            _grad_fn(sdpa_fwd), q, k, v, mask, do, warmup=warmup, iters=iters
        )

    flops = attention_flops(
        case.b,
        case.hq,
        case.nq,
        case.nkv,
        case.d,
        causal=case.causal,
        direction=direction,
    )
    return {
        "case": case.name,
        "direction": direction,
        "dtype": str(jnp.dtype(dtype)),
        "shape": f"B{case.b} Hq{case.hq} Hkv{case.hkv} Nq{case.nq} Nkv{case.nkv} D{case.d}",
        "ffpa_ms": t_ffpa,
        "sdpa_ms": t_sdpa,
        "ffpa_tflops": tflops_from_ms(flops, t_ffpa),
        "sdpa_tflops": tflops_from_ms(flops, t_sdpa),
        "speedup": t_sdpa / t_ffpa,
    }


def to_markdown(rows) -> str:
    lines = [
        "| case | dir | dtype | shape | FFPA ms | SDPA ms | FFPA | SDPA | speedup |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['case']} | {r['direction']} | {r['dtype']} | {r['shape']} "
            f"| {r['ffpa_ms']:.2f} | {r['sdpa_ms']:.2f} "
            f"| {format_tflops(r['ffpa_tflops'])} "
            f"| {format_tflops(r['sdpa_tflops'])} "
            f"| {r['speedup']:.2f}x |"
        )
    return "\n".join(lines)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m ffpa_attn_tpu.bench",
        description="FFPA-TPU benchmark vs XLA SDPA",
    )
    parser.add_argument("--cases", nargs="*", default=list(CASES), choices=CASES)
    parser.add_argument("--B", type=int, default=1)
    parser.add_argument("--H", type=int, default=32)
    parser.add_argument("--N", type=int, default=8192)
    parser.add_argument("--D", type=int, nargs="*", default=[512])
    parser.add_argument(
        "--dtypes", nargs="*", default=["bfloat16"], choices=["bfloat16", "float16"]
    )
    parser.add_argument(
        "--directions", nargs="*", default=["fwd"], choices=["fwd", "bwd"]
    )
    parser.add_argument("--backend", default=None)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--json", action="store_true", help="emit JSON lines")
    parser.add_argument("--output", default=None, help="markdown output path")
    args = parser.parse_args(argv)

    rows = []
    for dtype_name in args.dtypes:
        dtype = jnp.dtype(dtype_name)
        for d in args.D:
            for name in args.cases:
                case = make_case(name, args.B, args.H, args.N, d)
                for direction in args.directions:
                    if direction == "bwd" and case.nq == 1:
                        continue
                    row = run_case(
                        case,
                        dtype,
                        direction,
                        backend=args.backend,
                        warmup=args.warmup,
                        iters=args.iters,
                    )
                    rows.append(row)
                    if args.json:
                        print(json.dumps(row))
                    else:
                        print(
                            f"[{row['case']:>11s}] {direction} D={d} "
                            f"{dtype_name}: FFPA {row['ffpa_ms']:.2f}ms "
                            f"({format_tflops(row['ffpa_tflops'])}) vs SDPA "
                            f"{row['sdpa_ms']:.2f}ms "
                            f"({format_tflops(row['sdpa_tflops'])}) -> "
                            f"{row['speedup']:.2f}x"
                        )

    md = to_markdown(rows)
    if args.output:
        with open(args.output, "w") as f:
            f.write(md + "\n")
    else:
        print("\n" + md)
    return 0
