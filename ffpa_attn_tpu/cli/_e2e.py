"""End-to-end tokens/s benchmarks on the flagship FFPA transformer.

BASELINE.md requires tokens/s reporting (1 chip / 1 host / multi-host).
Two measurements on the current device set:

* ``train``: jitted train step (loss + grads + optax update) on the
  flagship config — tokens/s = B * N / step_time.
* ``decode``: KV-cache autoregressive generation after a prefill —
  tokens/s = generated tokens / loop time (scan-chained decode steps, so
  per-invocation dispatch overhead amortizes across the whole generation).

The reference's analog is its E2E Gemma training validation
(reference README.md:122); decode serving throughput has no reference
analog (single-kernel bench only) but is the number TPU users deploy by.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp


def bench_train(
    *, b=1, n=8192, d_model=1024, n_layers=4, n_heads=8, n_kv_heads=4,
    head_dim=512, vocab=32000, steps=3,
) -> dict:
    import optax

    from ..models import ModelConfig, init_params, make_train_step

    cfg = ModelConfig(
        vocab_size=vocab, d_model=d_model, n_layers=n_layers,
        n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        max_seq_len=n,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, n + 1), 0, vocab)
    step = make_train_step(cfg, opt)

    from ._bench import _sync

    params, opt_state, loss = step(params, opt_state, tokens)  # compile
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, tokens)
    _sync(loss)
    dt = (time.perf_counter() - t0) / steps
    return {
        "metric": "train_tokens_per_s",
        "value": round(b * n / dt, 1),
        "unit": "tokens/s",
        "config": f"L{n_layers} dm{d_model} H{n_heads}/{n_kv_heads} Dh{head_dim} N{n} B{b}",
        "step_ms": round(dt * 1e3, 2),
        "loss": float(loss),
    }


def bench_decode(
    *, b=1, prompt_len=4096, gen_len=128, d_model=1024, n_layers=4,
    n_heads=8, n_kv_heads=4, head_dim=512, vocab=32000,
) -> dict:
    from ..models import ModelConfig, generate, init_params

    cfg = ModelConfig(
        vocab_size=vocab, d_model=d_model, n_layers=n_layers,
        n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        max_seq_len=prompt_len + gen_len,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, prompt_len), 0, vocab)

    from ._bench import _sync

    out = generate(params, prompt, gen_len, cfg)  # compile + warmup
    _sync(out)
    t0 = time.perf_counter()
    out = generate(params, prompt, gen_len, cfg)
    _sync(out)
    dt = time.perf_counter() - t0
    return {
        "metric": "decode_tokens_per_s",
        "value": round(b * gen_len / dt, 1),
        "unit": "tokens/s",
        "config": f"L{n_layers} dm{d_model} H{n_heads}/{n_kv_heads} Dh{head_dim} prompt{prompt_len} gen{gen_len} B{b}",
        "total_s": round(dt, 3),
    }


def _bench_serve_impl(
    serve_fn, metric: str, *, batch, prompt_len, gen_len, d_model, n_layers,
    n_heads, n_kv_heads, head_dim, vocab, extra_cfg: str = "",
    cfg_overrides: dict | None = None,
    **serve_kwargs,
) -> dict:
    """Shared continuous-batching bench: same workload for every serving
    flavor (the dense-vs-paged comparison stays like-for-like)."""
    import numpy as np

    from ..models import ModelConfig, init_params

    cfg = ModelConfig(
        vocab_size=vocab, d_model=d_model, n_layers=n_layers,
        n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        max_seq_len=prompt_len + gen_len,
        **(cfg_overrides or {}),
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    lens = [prompt_len - int(rng.integers(0, prompt_len // 2)) for _ in range(batch)]
    prompts = [
        jnp.asarray(rng.integers(0, vocab, (ln,)), jnp.int32) for ln in lens
    ]
    max_len = prompt_len + gen_len

    from ._bench import _sync

    toks = serve_fn(params, prompts, gen_len, cfg, max_len, **serve_kwargs)
    _sync(toks)  # compile
    t0 = time.perf_counter()
    toks = serve_fn(params, prompts, gen_len, cfg, max_len, **serve_kwargs)
    _sync(toks)
    dt = time.perf_counter() - t0
    return {
        "metric": metric,
        "value": round(batch * gen_len / dt, 1),
        "unit": "tokens/s",
        "config": f"B{batch} mixed-prompts<= {prompt_len} gen{gen_len} "
        f"{extra_cfg}L{n_layers} dm{d_model} H{n_heads}/{n_kv_heads} "
        f"Dh{head_dim}",
        "total_s": round(dt, 3),
    }


def bench_serve(
    *, batch=4, prompt_len=1024, gen_len=128, d_model=1024, n_layers=4,
    n_heads=8, n_kv_heads=4, head_dim=512, vocab=32000,
) -> dict:
    """Continuous batching: packed mixed-length varlen prefill + scanned
    ragged batched decode (models/serving.py). The health metric is
    per-sequence throughput vs the single-sequence decode loop — the
    scanned decode should hold it within ~10% (VERDICT round-1 weak #6)."""
    from ..models.serving import serve_batch

    return _bench_serve_impl(
        serve_batch, "serve_tokens_per_s", batch=batch,
        prompt_len=prompt_len, gen_len=gen_len, d_model=d_model,
        n_layers=n_layers, n_heads=n_heads, n_kv_heads=n_kv_heads,
        head_dim=head_dim, vocab=vocab,
    )


def bench_serve_paged(
    *, batch=4, prompt_len=1024, gen_len=128, d_model=1024, n_layers=4,
    n_heads=8, n_kv_heads=4, head_dim=512, vocab=32000, page_size=256,
) -> dict:
    """Paged continuous batching (ops/paged.py pools): same workload as
    bench_serve, but KV lives in per-layer page pools — ragged batches
    stream bytes proportional to true lengths instead of max_len rows."""
    from ..models.serving import serve_batch_paged

    return _bench_serve_impl(
        serve_batch_paged, "serve_paged_tokens_per_s", batch=batch,
        prompt_len=prompt_len, gen_len=gen_len, d_model=d_model,
        n_layers=n_layers, n_heads=n_heads, n_kv_heads=n_kv_heads,
        head_dim=head_dim, vocab=vocab, extra_cfg=f"page{page_size} ",
        page_size=page_size,
    )


def bench_serve_paged_int8(**kw) -> dict:
    """int8 KV pools: half the decode stream on the bandwidth-bound step."""
    from ..models.serving import serve_batch_paged

    kw.setdefault("page_size", 256)
    return _bench_serve_impl(
        serve_batch_paged, "serve_paged_int8_tokens_per_s",
        batch=kw.pop("batch", 4), prompt_len=kw.pop("prompt_len", 1024),
        gen_len=kw.pop("gen_len", 128), d_model=kw.pop("d_model", 1024),
        n_layers=kw.pop("n_layers", 4), n_heads=kw.pop("n_heads", 8),
        n_kv_heads=kw.pop("n_kv_heads", 4), head_dim=kw.pop("head_dim", 512),
        vocab=kw.pop("vocab", 32000),
        extra_cfg=f"page{kw['page_size']} int8 ",
        quantized=True, **kw,
    )


def bench_serve_paged_window(
    *, batch=4, prompt_len=1024, gen_len=128, window=256, **kw
) -> dict:
    """Sliding-window model serving over paged pools: the page-walk clamp
    streams O(W) bytes per step regardless of cache length (the Mistral/
    gpt-oss serving shape) — compare against serve_paged_tokens_per_s,
    whose per-step stream grows with the full cache."""
    from ..models.serving import serve_batch_paged

    page_size = kw.pop("page_size", 128)
    return _bench_serve_impl(
        serve_batch_paged, "serve_paged_window_tokens_per_s", batch=batch,
        prompt_len=prompt_len, gen_len=gen_len,
        d_model=kw.pop("d_model", 1024), n_layers=kw.pop("n_layers", 4),
        n_heads=kw.pop("n_heads", 8), n_kv_heads=kw.pop("n_kv_heads", 4),
        head_dim=kw.pop("head_dim", 512), vocab=kw.pop("vocab", 32000),
        extra_cfg=f"page{page_size} W{window} ",
        cfg_overrides={"sliding_window": window},
        page_size=page_size, **kw,
    )


def bench_speculative(
    *, prompt_len=1024, gen_len=128, k_spec=4, d_model=1024, n_layers=4,
    n_heads=8, n_kv_heads=4, head_dim=512, vocab=32000, draft_layers=0,
) -> dict:
    """Speculative decoding tokens/s.

    ``draft_layers=0`` (self-spec, draft == target): the acceptance-rate
    CEILING — it can never beat plain decode (the draft costs as much as
    the target; its value is validating the verify-block plumbing).
    ``draft_layers=m > 0``: shallow-layer self-draft — the draft is the
    target's FIRST m layers (shared weights, own KV cache), the standard
    zero-training draft; per accepted token the draft costs m/L of a
    target step, so throughput beats plain decode whenever the acceptance
    rate clears ~(1 + k*m/L)/(k+1)."""
    import dataclasses

    import numpy as np

    from ..models import ModelConfig, init_params, speculative_generate

    cfg = ModelConfig(
        vocab_size=vocab, d_model=d_model, n_layers=n_layers,
        n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        max_seq_len=prompt_len + gen_len + k_spec + 2,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    if draft_layers > 0:
        cfg_d = dataclasses.replace(cfg, n_layers=draft_layers)
        params_d = dict(params, layers=params["layers"][:draft_layers])
        label = f"shallow-draft L{draft_layers}/{n_layers}"
    else:
        cfg_d, params_d, label = cfg, params, "self-spec"
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, vocab, (1, prompt_len)), jnp.int32)
    max_len = prompt_len + gen_len + k_spec + 2

    from ._bench import _sync

    toks, stats = speculative_generate(
        params, params_d, prompt, gen_len, cfg, cfg_d, max_len,
        k_spec=k_spec, return_stats=True,
    )
    _sync(toks)  # compile
    t0 = time.perf_counter()
    toks, stats = speculative_generate(
        params, params_d, prompt, gen_len, cfg, cfg_d, max_len,
        k_spec=k_spec, return_stats=True,
    )
    _sync(toks)
    dt = time.perf_counter() - t0
    return {
        "metric": "speculative_tokens_per_s"
        if draft_layers == 0
        else "speculative_draft_tokens_per_s",
        "value": round(gen_len / dt, 1),
        "unit": "tokens/s",
        "config": f"{label} k{k_spec} prompt{prompt_len} gen{gen_len} "
        f"L{n_layers} dm{d_model} H{n_heads}/{n_kv_heads} Dh{head_dim}",
        "accept_rate": round(
            stats["draft_accepted"] / max(stats["proposals"], 1), 3
        ),
        "total_s": round(dt, 3),
    }


def bench_scaling_projection() -> dict:
    """Two-host ring-scaling projection anchored to a rate MEASURED on
    this chip right now (VERDICT r3 item 9): time the flagship fwd case,
    feed its achieved FLOPs rate into the analytic model's compute leg.
    The ICI bandwidth stays the labeled spec constant (unmeasurable with
    one attached chip) — the report is a projection, not a measurement.
    """
    import jax.numpy as jnp

    from ..parallel.analysis import ICI_BW_BYTES, two_host_report
    from ._bench import make_case, run_case

    row = run_case(
        make_case("self-attn", 1, 32, 8192, 512), jnp.bfloat16, "fwd",
        iters=5, verify=False,
    )
    measured = row["ffpa_tflops"] * 1e12
    report = two_host_report(mxu_flops=measured)
    return {
        "metric": "ring_scaling_projection",
        "measured_mxu_tflops": round(measured / 1e12, 1),
        "ici_bw_gbytes_per_s_SPEC": ICI_BW_BYTES / 1e9,
        "projections": [
            {
                "chips": p.chips,
                "step_ms": round(p.t_step_ms, 3),
                "hop_ms": round(p.t_hop_ms, 3),
                "efficiency_pct": round(p.efficiency * 100, 1),
            }
            for p in report
        ],
    }


#: name -> zero-arg bench callable. Ordered; each runs in its own process
#: under ``main`` so one wedged TPU client cannot poison the rest (the
#: round-4 run lost five benches to a single InvalidArgument cascade).
E2E_BENCHES = {
    "smoke": functools.partial(
        bench_decode, b=1, prompt_len=64, gen_len=8, d_model=64, n_layers=1,
        n_heads=2, n_kv_heads=1, head_dim=64, vocab=256,
    ),
    "train": bench_train,
    "decode": bench_decode,
    "serve": bench_serve,
    "serve_paged": bench_serve_paged,
    "serve_paged_int8": bench_serve_paged_int8,
    "serve_paged_window": bench_serve_paged_window,
    "speculative": bench_speculative,
    "speculative_draft": functools.partial(bench_speculative, draft_layers=1),
    "scaling_projection": bench_scaling_projection,
}


def run_one(name: str) -> int:
    """Run a single e2e bench in THIS process; full traceback on stderr."""
    import sys
    import traceback

    fn = E2E_BENCHES[name]
    try:
        print(json.dumps(fn()), flush=True)
        return 0
    except Exception as exc:
        traceback.print_exc()
        print(
            json.dumps({"metric": f"bench_{name}", "error": str(exc)[:300]}),
            flush=True,
        )
        return 1


def main(argv=None, only=None) -> int:
    """Run each bench in a fresh subprocess (fresh TPU client per bench).

    ``only`` (or FFPA_TPU_E2E_ONLY, comma-separated names) restricts the
    set; FFPA_TPU_E2E_INPROC=1 falls back to same-process execution
    (used by the subprocess leg itself, and handy under debuggers).
    """
    import os
    import subprocess
    import sys

    # "smoke" is a plumbing-test leg (tiny shapes), selectable but not
    # part of the default sweep.
    names = [n for n in E2E_BENCHES if n != "smoke"]
    sel = only or os.environ.get("FFPA_TPU_E2E_ONLY")
    if sel:
        sel = [s.strip() for s in (sel.split(",") if isinstance(sel, str) else sel)]
        unknown = [s for s in sel if s not in E2E_BENCHES]
        if unknown:
            raise SystemExit(
                f"unknown e2e bench(es) {unknown}; have {list(E2E_BENCHES)}"
            )
        names = sel

    if os.environ.get("FFPA_TPU_E2E_INPROC") == "1":
        rc = 0
        for name in names:
            rc |= run_one(name)
        return rc

    # Per-leg wall cap: one wedged device program (the round-5 speculative
    # while_loop class) must not eat every later bench's budget the way a
    # poisoned client used to.
    leg_timeout = int(os.environ.get("FFPA_TPU_E2E_LEG_TIMEOUT_S") or 1200)
    rc = 0
    for name in names:
        env = dict(os.environ, FFPA_TPU_E2E_INPROC="1", FFPA_TPU_E2E_ONLY=name)
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "ffpa_attn_tpu.bench", "--e2e"],
                env=env, capture_output=True, text=True, timeout=leg_timeout,
            )
        except subprocess.TimeoutExpired:
            rc = 1
            print(
                json.dumps({
                    "metric": f"bench_{name}",
                    "error": f"timeout after {leg_timeout}s",
                }),
                flush=True,
            )
            continue
        emitted = [
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"metric"' in ln
        ]
        for ln in emitted:
            print(ln, flush=True)
        if proc.returncode != 0 or not emitted:
            rc = 1
            sys.stderr.write(proc.stderr[-4000:] + "\n")
            if not emitted:
                print(
                    json.dumps({
                        "metric": f"bench_{name}",
                        "error": f"subprocess rc={proc.returncode}",
                    }),
                    flush=True,
                )
    return rc
