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
    "decode-gqa",
    "gqa",
    "causal",
    "attn-mask",
    "dropout",
    "non-aligned",
    "sliding-window",
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
    window: tuple = (-1, -1)

    @property
    def window_active(self) -> bool:
        return self.window[0] >= 0 or (
            not self.causal and self.window[1] >= 0
        )


def make_case(name: str, b: int, h: int, n: int, d: int) -> BenchCase:
    if name == "self-attn":
        return BenchCase(name, b, h, h, n, n, d)
    if name == "cross-attn":
        return BenchCase(name, b, h, h, max(n // 8, 128), n, d)
    if name == "decode":
        return BenchCase(name, b, h, h, 1, n, d)
    if name == "decode-gqa":
        # Grouped-KV decode (Hq 32 / Hkv 8 at defaults): the PackGQA single
        # -pass kernel reads each KV head once for the whole Q group; the
        # stock-XLA baseline must expand KV to Hq heads (reference
        # publishes decode GQA speedups, bench/README.md:53).
        return BenchCase(name, b, h, max(h // 4, 1), 1, n, d)
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
    if name == "sliding-window":
        # Mistral-style causal sliding window at W = N/8: FFPA computes
        # (and streams) only the band; every stock-XLA baseline still pays
        # the full N^2 (jax dpa's local_window_size masks but does not
        # skip). A case the reference cannot run at all (window_size is on
        # its rejected-kwargs list, cute/__init__.py:65-125).
        return BenchCase(
            name, b, h, h, n, n, d, causal=True,
            window=(max(n // 8, 512), -1),
        )
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


def _sync(out) -> None:
    """Device sync that also works over remote-dispatch backends where a bare
    block_until_ready can return early: fetch one element to host."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.block_until_ready(leaf)
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Wall-clock ms/iter (reference runners use warmup=2 iters=10,
    cli/_runner_fwd.py)."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def time_chained(step_fn, q, *rest, iters: int = 10, warmup: bool = True) -> float:
    """ms/iter with iterations chained inside ONE jit via lax.scan,
    measured at two scan lengths so fixed overhead cancels exactly.

    Remote-dispatch backends (the axon tunnel) add a large (~50-70 ms) and
    *program-dependent* fixed overhead per executable invocation, so
    python-loop timing — and even single-length chained timing with a
    separately-measured overhead subtraction — misreports kernels in the
    sub-10ms range (measured: a 268 MB copy read 214 GB/s at one length but
    585 GB/s at another). Timing lengths N and 3N and reporting
    ``(t_3N - t_N) / 2N`` cancels every per-invocation cost by
    construction. ``step_fn(q, *rest) -> array of q's shape`` (attention
    output or dq), optionally ``(out, *aux)`` where every auxiliary array
    is ACCUMULATED into a same-shape scan carry. Accumulation (not a
    scalar reduction) forces full materialization each iteration: with a
    plain ``sum(aux)`` XLA's algebraic simplifier rewrites
    ``sum(A @ B)`` into reduced-operand dots, so a composite baseline's
    dK/dV never touched HBM while an opaque kernel's always did — a
    protocol asymmetry, since any real consumer (the optimizer) needs the
    gradients materialized, and the reference's torch bench pays the same
    ``.grad`` buffer writes on both sides.
    """
    eps = jnp.zeros((), jnp.float32)
    aux_shapes = None
    probe = jax.eval_shape(lambda *a: step_fn(*a), q, *rest)
    if isinstance(probe, tuple):
        aux_shapes = probe[1:]

    def make(length):
        @jax.jit
        def chained(q, eps, *rest):
            def body(carry, _):
                prim, accs = carry
                out = step_fn(prim, *rest)
                if isinstance(out, tuple):
                    out, *aux = out
                    accs = tuple(
                        (a.astype(jnp.float32) + x.astype(jnp.float32)
                         ).astype(a.dtype)
                        for a, x in zip(accs, aux)
                    )
                # Traced-eps data dependence: not constant-foldable,
                # numerically a no-op.
                nxt = (
                    carry[0].astype(jnp.float32)
                    + out.astype(jnp.float32) * eps
                ).astype(prim.dtype)
                return (nxt, accs), ()

            accs0 = ()
            if aux_shapes is not None:
                accs0 = tuple(
                    jnp.zeros(s.shape, s.dtype) for s in aux_shapes
                )
            (final, accs), _ = jax.lax.scan(
                body, (q, accs0), None, length=length
            )
            return (final, *accs)

        return chained

    def make_runner(length):
        fn = make(length)
        out = fn(q, eps, *rest)  # compile + warmup
        _sync(out[0] if isinstance(out, tuple) else out)

        def once() -> float:
            t0 = time.perf_counter()
            o = fn(q, eps, *rest)
            _sync(o[0] if isinstance(o, tuple) else o)
            return (time.perf_counter() - t0) * 1e3

        return once

    def diff_ms(short, long_, n: int) -> float:
        ts = min(short(), short())
        tl = min(long_(), long_())
        return max(tl - ts, 2e-3 * n) / (2 * n)

    def diff_median(short, long_, n: int, reps: int) -> float:
        """Median-of-``reps`` paired two-length diffs. Sub-10 ms kernels sit
        close to the tunnel's per-invocation noise floor, and a single
        (t_3N - t_N) pair has shown 1.01x-1.19x run-to-run spread at ~7 ms
        (docs/bench_v5e_d512_n8192.md footnote); interleaved pairs share
        drift and the median discards outlier invocations."""
        diffs = sorted(
            max(long_() - short(), 2e-3 * n) / (2 * n) for _ in range(reps)
        )
        return diffs[len(diffs) // 2]

    # Runners compile once per scan length and are REUSED by every timing
    # pass below — compiles (20-60 s each over the remote tunnel) dominate
    # per-case cost, so the estimate and the median must share programs.
    short, long_ = make_runner(iters), make_runner(3 * iters)
    est = diff_ms(short, long_, iters)
    # If the measured span (2*iters*est) is small vs invocation noise
    # (~few ms), redo at a length where real work dominates.
    n = iters
    if 2 * iters * est < 100.0:
        n = min(max(int(100.0 / max(est, 0.05)), iters), 2048)
        if n != iters:
            short, long_ = make_runner(n), make_runner(3 * n)
    if est < 10.0:
        return diff_median(short, long_, n, 5)
    if n != iters:
        return diff_ms(short, long_, n)
    return est


def _ffpa_fwd_fn(case: BenchCase, backend: Optional[str]):
    kwargs = {}
    if backend:
        kwargs["backend"] = backend
    if case.window_active:
        kwargs["window_size"] = case.window

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


def _chunked_xla_sdpa(
    q, k, v, mask, *, causal: bool, chunk: int = 1024, window=(-1, -1)
):
    """Query-chunked fp32-softmax attention — the memory-feasible "stock
    XLA" composite JAX users write when the naive composite OOMs at long N
    (flash-free; scores materialized per chunk only)."""
    b, h, nq, d = q.shape
    nkv = k.shape[2]
    chunk = min(chunk, nq)
    pad = (-nq) % chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nchunks = qp.shape[2] // chunk
    scale = 1.0 / (d ** 0.5)
    offset = nkv - nq

    @jax.checkpoint
    def one(idx):
        # Remat per chunk: without it jax.grad stashes every chunk's fp32
        # softmax as scan residuals (~9 GB at N=8192) and OOMs — remat is
        # what a JAX user must do to backprop this composite at all.
        qc = jax.lax.dynamic_slice_in_dim(qp, idx * chunk, chunk, axis=2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qc, k).astype(jnp.float32) * scale
        if mask is not None:
            mc = mask
            if mask.shape[2] != 1:
                mc = jax.lax.dynamic_slice_in_dim(mask, idx * chunk, chunk, axis=2)
            s = s + mc
        wl = int(window[0])
        wr = 0 if causal else int(window[1])
        if causal or wr >= 0 or wl >= 0:
            rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, nkv), 0) + idx * chunk
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, nkv), 1)
            if causal or wr >= 0:
                s = jnp.where(cols <= rows + offset + (0 if causal else wr), s, -1e30)
            if wl >= 0:
                s = jnp.where(cols >= rows + offset - wl, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    out = jax.lax.map(one, jnp.arange(nchunks))  # [nchunks, B, H, chunk, D]
    out = jnp.moveaxis(out, 0, 2).reshape(b, h, nchunks * chunk, v.shape[-1])
    return out[:, :, :nq]


def _sdpa_fwd_fn(case: BenchCase, variant: str):
    """One stock-XLA SDPA baseline variant (the analog of the reference's
    torch SDPA baseline). ``variant``:

    * ``"dpa"`` — ``jax.nn.dot_product_attention`` (XLA's composite; only
      viable when the full scores tensor fits HBM);
    * ``"chunked"`` — the query-chunked fp32 composite with per-chunk remat.

    ``run_case`` times both viable variants and scores FFPA against the
    FASTER one, so the reported speedup is vs the best stock-XLA option.
    XLA's composite has no attention dropout; the dropout case is timed
    against the dropout-free baseline (conservative for our speedup).
    """
    hq = case.hq

    def fn(q, k, v, mask):
        k_e = expand_kv_heads(k, hq)
        v_e = expand_kv_heads(v, hq)
        if variant == "chunked":
            return _chunked_xla_sdpa(
                q, k_e, v_e, mask, causal=case.causal, window=case.window
            )
        extra = {}
        if case.window_active:
            wl, wr = case.window
            # jax dpa has no "unbounded" sentinel; >= nkv is equivalent.
            extra["local_window_size"] = (
                wl if wl >= 0 else case.nkv,
                0 if case.causal else (wr if wr >= 0 else case.nkv),
            )
        out = jax.nn.dot_product_attention(
            jnp.swapaxes(q, 1, 2),
            jnp.swapaxes(k_e, 1, 2),
            jnp.swapaxes(v_e, 1, 2),
            bias=mask,
            is_causal=case.causal,
            **extra,
        )
        return jnp.swapaxes(out, 1, 2)

    return fn


def _sdpa_variants(case: BenchCase) -> list[str]:
    scores_bytes = case.b * case.hq * case.nq * case.nkv * 4
    if scores_bytes > 2 * 1024**3:
        return ["chunked"]
    return ["dpa", "chunked"]


def _grad_step(fwd_fn, has_mask: bool):
    """Backward step for chained timing: returns (dq, dk, dv) so every
    gradient is MATERIALIZED by the timing harness (time_chained
    accumulates dk/dv into full-size carries). A scalar ``sum(dk)`` keep-
    alive is not enough: XLA rewrites ``sum(A @ B)`` algebraically and a
    composite baseline then never writes its dK/dV to HBM — free for the
    baseline, impossible for an opaque Pallas kernel, and unrepresentative
    of training, where the optimizer consumes full gradient buffers (the
    reference's torch bench equally materializes ``.grad`` on both sides).

    ``mask``/``do`` arrive as traced arguments, never closure constants — a
    captured 8192x8192 mask or [B,H,N,D] dO would be baked into the
    serialized program as a literal (268 MB at the headline shape) and
    overflow remote-compile request limits.
    """

    if has_mask:

        def step(q, k, v, mask, do):
            def loss(q_, k_, v_):
                return (
                    fwd_fn(q_, k_, v_, mask).astype(jnp.float32)
                    * do.astype(jnp.float32)
                ).sum()

            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return dq, dk, dv

    else:

        def step(q, k, v, do):
            def loss(q_, k_, v_):
                return (
                    fwd_fn(q_, k_, v_, None).astype(jnp.float32)
                    * do.astype(jnp.float32)
                ).sum()

            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return dq, dk, dv

    return step


def _verify_case(case: BenchCase, dtype, direction: str, backend) -> None:
    """Correctness gate before timing (reference runners validate every
    bench case against SDPA before measuring, cli/_runner_fwd.py:1-14) — a
    fast-but-wrong config must never produce a great table.

    Dropout-free cases are checked at FULL bench shape against the chunked
    fp32-softmax composite; the dropout case (no stock-XLA counterpart)
    is checked against the fp32 oracle at a capped shape that still
    exercises the same kernel features.
    """
    import numpy as np

    tol = 1e-2 if jnp.dtype(dtype) == jnp.float16 else 5e-2

    def rel(a, b):
        a = np.asarray(jax.device_get(a), np.float32)
        b = np.asarray(jax.device_get(b), np.float32)
        return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))

    if case.dropout_p > 0.0 or case.mask:
        # Capped-shape verification vs the fp32 oracle: dropout has no
        # stock-XLA counterpart, and the mask case's full-shape verify
        # would hold a second [B,Hq,Nq,Nkv] fp32 bias (8.6 GB at the
        # headline shape) alongside the bench tensors — OOM. The capped
        # case exercises the same kernel features.
        from ..ops.reference import reference_attention

        vcase = BenchCase(
            case.name, case.b, case.hq, case.hkv,
            min(case.nq, 2048), min(case.nkv, 2048), case.d,
            case.causal, case.mask, case.dropout_p,
        )
        q, k, v, mask, do = _inputs(vcase, dtype, seed=7)
        got = _ffpa_fwd_fn(vcase, backend)(q, k, v, mask)
        want = reference_attention(
            q, k, v, mask, is_causal=vcase.causal,
            scale=vcase.d**-0.5, dropout_p=vcase.dropout_p,
        )
        if rel(got, want) >= tol:
            raise RuntimeError(
                f"bench verify FAILED for {vcase.name}: "
                f"rel={rel(got, want):.3f} >= {tol}"
            )
        return

    q, k, v, mask, do = _inputs(case, dtype, seed=7)
    ffpa = _ffpa_fwd_fn(case, backend)
    oracle = _sdpa_fwd_fn(case, "chunked")
    got = jax.jit(lambda *a: ffpa(*a))(q, k, v, mask)
    want = jax.jit(lambda *a: oracle(*a))(q, k, v, mask)
    r = rel(got, want)
    if r >= tol:
        raise RuntimeError(
            f"bench verify FAILED for {case.name} fwd: rel={r:.3f} >= {tol}"
        )
    if direction == "bwd":
        def dq_of(fwd_fn):
            # k/v/mask/do ride as traced args — closure constants would be
            # serialized into the program (HTTP 413 on remote compile).
            def loss(q_, k_, v_, m_, do_):
                return (
                    fwd_fn(q_, k_, v_, m_).astype(jnp.float32)
                    * do_.astype(jnp.float32)
                ).sum()

            return jax.jit(jax.grad(loss))(q, k, v, mask, do)

        r = rel(dq_of(ffpa), dq_of(oracle))
        if r >= tol:
            raise RuntimeError(
                f"bench verify FAILED for {case.name} bwd dq: rel={r:.3f} "
                f">= {tol}"
            )


def run_case(
    case: BenchCase,
    dtype,
    direction: str,
    backend: Optional[str] = None,
    warmup: int = 2,
    iters: int = 10,
    verify: bool = True,
):
    q, k, v, mask, do = _inputs(case, dtype)
    ffpa_fwd = _ffpa_fwd_fn(case, backend)

    if verify:
        _verify_case(case, dtype, direction, backend)

    has_mask = mask is not None

    def fwd_step(fwd_fn):
        if has_mask:
            return lambda q_, k_, v_, m_: fwd_fn(q_, k_, v_, m_)
        return lambda q_, k_, v_: fwd_fn(q_, k_, v_, None)

    def time_or_inf(step, *args):
        try:
            return time_chained(step, *args, iters=iters)
        except Exception as exc:  # baseline variant OOM etc.
            print(f"  [baseline variant failed: {str(exc)[:120]}]")
            return float("inf")

    if direction == "fwd":
        rest = (k, v, mask) if has_mask else (k, v)
        t_ffpa = time_chained(fwd_step(ffpa_fwd), q, *rest, iters=iters)
        t_sdpa = min(
            time_or_inf(fwd_step(_sdpa_fwd_fn(case, var)), q, *rest)
            for var in _sdpa_variants(case)
        )
    else:
        # jax.grad re-runs the forward inside the step, so subtract a
        # forward-only measurement to report the backward pass alone — the
        # reference times `out.backward()` with residuals saved
        # (cli/_runner_bwd.py), and the 2.5x FLOPs model assumes that.
        rest = (k, v, mask, do) if has_mask else (k, v, do)
        fwd_rest = (k, v, mask) if has_mask else (k, v)
        t_ffpa_grad = time_chained(
            _grad_step(ffpa_fwd, has_mask), q, *rest, iters=iters
        )
        t_ffpa_fwd = time_chained(fwd_step(ffpa_fwd), q, *fwd_rest, iters=iters)
        t_ffpa = max(t_ffpa_grad - t_ffpa_fwd, 1e-3)
        t_sdpa = float("inf")
        for var in _sdpa_variants(case):
            sdpa_fwd = _sdpa_fwd_fn(case, var)
            t_grad = time_or_inf(_grad_step(sdpa_fwd, has_mask), q, *rest)
            if t_grad == float("inf"):
                continue
            t_fwd = time_or_inf(fwd_step(sdpa_fwd), q, *fwd_rest)
            t_sdpa = min(t_sdpa, max(t_grad - t_fwd, 1e-3))

    flops = attention_flops(
        case.b,
        case.hq,
        case.nq,
        case.nkv,
        case.d,
        causal=case.causal,
        direction=direction,
        window=case.window,
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


def md_preamble(rows, verified: bool = True) -> str:
    """Provenance header written above every generated table: device, date,
    and the timing protocol. Round-3 advisor finding: tables must state the
    protocol they were measured under, or stale old-protocol tables become
    indistinguishable from fresh ones."""
    import time

    try:
        import jax

        device = jax.devices()[0].device_kind
    except Exception:
        device = "unknown-device"
    has_bwd = any(r["direction"] == "bwd" for r in rows)
    proto = (
        " Backward rows use the materializing-grad protocol "
        '(docs/design.md "Grad materialization protocol": each gradient '
        "accumulated into a same-shape carry so BOTH contenders pay the "
        "dK/dV writes)." if has_bwd else ""
    )
    gate = (
        " pre-timing correctness gate on."
        if verified else " correctness gate SKIPPED (--no-verify)."
    )
    import os

    layers = os.environ.get("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "1")
    return (
        f"Measured {time.strftime('%Y-%m-%d')} on {device}; single-call "
        f"bench (FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS={layers}),{gate}{proto}\n"
    )


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


def save_plot(rows, path: str, title: str) -> Optional[str]:
    """Grouped-bar TFLOPS comparison png (reference emits
    ffpa_{device}_speedup.png, cli/_bench.py). Colors: validated categorical
    slots 1-2 (blue/orange) from the dataviz reference palette; identity is
    also carried by the legend, speedups by direct labels."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    import numpy as np

    labels = [f"{r['case']}\n{r['direction']}" for r in rows]
    ffpa = [r["ffpa_tflops"] for r in rows]
    sdpa = [r["sdpa_tflops"] for r in rows]
    x = np.arange(len(rows))
    w = 0.38

    fig, ax = plt.subplots(figsize=(max(6.0, 1.1 * len(rows)), 3.6), dpi=150)
    ax.bar(x - w / 2, ffpa, w, label="FFPA-TPU", color="#2a78d6",
           edgecolor="white", linewidth=1.0)
    ax.bar(x + w / 2, sdpa, w, label="XLA SDPA", color="#eb6834",
           edgecolor="white", linewidth=1.0)
    for xi, r in zip(x, rows):
        ax.annotate(
            f"{r['speedup']:.2f}x",
            (xi - w / 2, r["ffpa_tflops"]),
            textcoords="offset points", xytext=(0, 3),
            ha="center", fontsize=7, color="#333333",
        )
    ax.set_ylabel("TFLOPS")
    ax.set_title(title, fontsize=10)
    ax.set_xticks(x, labels, fontsize=7)
    ax.tick_params(axis="y", labelsize=7)
    ax.spines[["top", "right"]].set_visible(False)
    ax.grid(axis="y", color="#dddddd", linewidth=0.5, zorder=0)
    ax.set_axisbelow(True)
    ax.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


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
    parser.add_argument(
        "--no-verify", action="store_true",
        help="skip the pre-timing correctness gate (each case is otherwise "
        "validated against the fp32-softmax composite before measuring)",
    )
    parser.add_argument("--json", action="store_true", help="emit JSON lines")
    parser.add_argument("--output", default=None, help="markdown output path")
    parser.add_argument(
        "--plot", default=None,
        help="png output path (default: --output with a .png suffix, "
        "or skip when --output is not given)",
    )
    parser.add_argument(
        "--e2e", action="store_true",
        help="run end-to-end train/decode tokens-per-second benchmarks "
        "instead of the kernel cases",
    )
    args = parser.parse_args(argv)

    # The kernel bench is a SINGLE attention call per step, so the
    # S-residency auto gate's stacked-model layer multiplier does not
    # apply — declare one layer (same spirit as the reference benching
    # with autotune=max: the library's best honest single-call config).
    # The stock-XLA baseline is symmetrically unconstrained: its
    # auto-remat saves chunk residuals with ALL free HBM. Explicit env
    # settings still win over this default.
    import os

    if os.environ.setdefault("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "1") == "1":
        print("[bench] single-call bench: FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS=1")

    if args.e2e:
        from ._e2e import main as e2e_main

        return e2e_main()

    rows = []
    for dtype_name in args.dtypes:
        dtype = jnp.dtype(dtype_name)
        for d in args.D:
            for name in args.cases:
                case = make_case(name, args.B, args.H, args.N, d)
                for direction in args.directions:
                    row = run_case(
                        case,
                        dtype,
                        direction,
                        backend=args.backend,
                        warmup=args.warmup,
                        iters=args.iters,
                        verify=not args.no_verify,
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
            f.write(
                md_preamble(rows, verified=not args.no_verify)
                + "\n" + md + "\n"
            )
    else:
        print("\n" + md)

    plot_path = args.plot
    if plot_path is None and args.output:
        # Derive from the OUTPUT name (not a fixed device-wide name: a
        # variant table like the f16 lane must not clobber the headline
        # bf16 speedup plot).
        plot_path = str(
            __import__("pathlib").Path(args.output).with_suffix(".png")
        )
    if plot_path and rows:
        shape = rows[0]["shape"]
        written = save_plot(
            rows, plot_path, f"FFPA-TPU vs XLA SDPA — {shape}"
        )
        if written:
            print(f"plot written: {written}")
    return 0
