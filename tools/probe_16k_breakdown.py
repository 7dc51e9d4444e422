"""Decompose the N=16K self-attn backward into its component launches.

The 16K self-attn bwd row is the one place FFPA trails stock XLA (0.85x,
docs/bench_v5e_n16384.md). The matmul-count analysis (docs/design.md §16K)
puts both sides at ~5 units; the residual ~15% must come from dS/dq-acc
HBM traffic exposure, stripe-loop overheads, or kernel inefficiency at the
16K block shapes. This probe times each component in isolation so the
deficit can be attributed instead of guessed:

  fwd             forward (lse producer), for reference
  bwd_handoff     production striped dS-handoff path (ds_handoff=True)
  bwd_recompute   two-kernel recompute scheme (ds_handoff=False) — 7 units
  dkdv_only       dK/dV launch alone, no dS emission (4 in-kernel units)
  dq_einsum       the dS @ K einsum alone on a synthetic dS slab (1 unit
                  + the dS read stream)
  xla_grad        best stock-XLA baseline grad (what the bench divides by)

Expected identities if nothing is exposed: bwd_handoff ~= dkdv_only +
dq_einsum (the handoff kernel does the same 4 units as dkdv_only, plus
the dS output stream) and the gap bwd_handoff - (dkdv_only + dq_einsum)
is the exposure the 16K campaign needs to eliminate.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_16k_breakdown.py
"""
import functools
import os

os.environ.setdefault("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "1")
# Pure handoff for the breakdown (partial residency is probed separately
# by probe_16k_hybrid.py).
os.environ.setdefault("FFPA_TPU_SCORES_RESIDUAL_LIMIT_BYTES", "0")

import jax
import jax.numpy as jnp


def main():
    print(jax.devices(), flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dt = jnp.bfloat16
    b, h, n, d = 1, 32, 16384, 512
    scale = d ** -0.5
    q = jax.random.normal(ks[0], (b, h, n, d), dt)
    k = jax.random.normal(ks[1], (b, h, n, d), dt)
    v = jax.random.normal(ks[2], (b, h, n, d), dt)
    do = jax.random.normal(ks[3], (b, h, n, d), dt)

    from ffpa_attn_tpu.cli._bench import time_chained
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward

    def tc(fn, *args, iters=3):
        return time_chained(fn, *args, iters=iters)

    # --- fwd (produces o, lse for the bwd components) ---
    def fwd(q_, k_, v_):
        o_, lse_ = flash_attention_forward(
            q_, k_, v_, None, scale=scale, is_causal=False
        )
        return o_, jnp.sum(lse_)

    t_fwd = tc(fwd, q, k, v)
    print(f"fwd             {t_fwd:8.2f} ms", flush=True)

    # o/lse are PASSED as traced args (never closure constants: the axon
    # remote-compile tunnel 413s on large captured arrays, docs/env.md).
    o, lse = flash_attention_forward(q, k, v, None, scale=scale, is_causal=False)
    o = jax.block_until_ready(o)

    def bwd(handoff, q_, k_, v_, o_, lse_, do_):
        dq, dk, dv, _ = flash_attention_backward(
            q_, k_, v_, None, o_, lse_, do_,
            scale=scale, is_causal=False, ds_handoff=handoff,
        )
        return dq, jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv.astype(jnp.float32))

    for name, handoff in (("bwd_handoff", True), ("bwd_recompute", False)):
        try:
            t = tc(functools.partial(bwd, handoff), q, k, v, o, lse, do)
            print(f"{name:15s} {t:8.2f} ms", flush=True)
        except Exception as exc:
            print(f"{name:15s} FAILED {str(exc)[:140]}", flush=True)

    # Optional profiler trace of ONE handoff grad (FFPA_TPU_PROBE_TRACE=1):
    # the trace shows dS-write/read DMA vs MXU overlap directly — the
    # ground truth behind the exposure numbers above.
    if os.environ.get("FFPA_TPU_PROBE_TRACE") == "1":
        from ffpa_attn_tpu.utils.profiling import trace

        fn = jax.jit(functools.partial(bwd, True))
        out = fn(q, k, v, o, lse, do)  # compile outside the trace
        jax.block_until_ready(out)
        tdir = "tools/r3_logs/trace_16k_bwd"
        with trace(tdir):
            jax.block_until_ready(fn(q, k, v, o, lse, do))
        print(f"trace written to {tdir}", flush=True)

    # --- dK/dV launch alone (no dS emission): the 4 in-kernel units ---
    def dkdv_only(q_, k_, v_, o_, lse_, do_):
        _, dk, dv, _ = flash_attention_backward(
            q_, k_, v_, None, o_, lse_, do_,
            scale=scale, is_causal=False, run_dq=False,
        )
        return dk, jnp.sum(dv.astype(jnp.float32))

    try:
        t = tc(dkdv_only, q, k, v, o, lse, do)
        print(f"dkdv_only       {t:8.2f} ms", flush=True)
    except Exception as exc:
        print(f"dkdv_only       FAILED {str(exc)[:140]}", flush=True)

    # --- the dQ einsum alone on a synthetic striped dS ---
    # One stripe's slab at the production stripe width (ds limit 5 GiB over
    # a 16 GiB full slab -> 4 stripes of 4096 columns).
    stripe = 4096
    ds_slab = jax.random.normal(ks[0], (b, h, n, stripe), jnp.bfloat16)

    def dq_einsum(ds_, k_):
        from ffpa_attn_tpu.ops.flash_bwd import _dq_from_ds

        dq_s, _ = _dq_from_ds(
            ds_, k_[:, :, :stripe], None,
            scale=scale, group=1, nq=n, nkv=stripe, dq_dtype=jnp.float32,
        )
        # The slab is the scan carry (the einsum must depend on it, or XLA
        # hoists the whole matmul out of the timing loop); dq_s stays alive
        # through the scalar extra.
        return ds_, jnp.sum(dq_s)

    try:
        t = tc(dq_einsum, ds_slab, k)
        print(f"dq_einsum(1/4)  {t:8.2f} ms  (x4 stripes = {4 * t:7.2f})", flush=True)
    except Exception as exc:
        print(f"dq_einsum       FAILED {str(exc)[:140]}", flush=True)

    # --- stock-XLA baseline grad (what the bench divides by) ---
    def xla_grad(q_, k_, v_, do_):
        def loss(q2, k2, v2):
            out = jax.nn.dot_product_attention(
                jnp.swapaxes(q2, 1, 2), jnp.swapaxes(k2, 1, 2),
                jnp.swapaxes(v2, 1, 2), scale=scale,
            )
            return (out.astype(jnp.float32) * jnp.swapaxes(do_, 1, 2).astype(jnp.float32)).sum()

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
        return dq, jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv.astype(jnp.float32))

    try:
        t = tc(xla_grad, q, k, v, do)
        print(f"xla_grad        {t:8.2f} ms  (includes its own fwd)", flush=True)
    except Exception as exc:
        print(f"xla_grad        FAILED {str(exc)[:140]}", flush=True)

    # --- fp8 dS storage A/B (opt-in knob, env.md FFPA_TPU_ALLOW_FP8_DS):
    # halves the handoff slab's write+read stream. Compile failure here
    # means Mosaic/v5e rejects fp8 stores — that is the answer too.
    os.environ["FFPA_TPU_ALLOW_FP8_DS"] = "1"
    from dataclasses import replace
    from ffpa_attn_tpu.ops.dispatch import pick_backward_config

    cfg8 = replace(
        pick_backward_config(
            d=d, dv=d, nq=n, nkv=n, dtype=q.dtype,
            causal=False, has_bias=False, dropout=False, gqa=False, group=0,
        ),
        ds_store_bits=8,
    )

    def bwd_fp8(q_, k_, v_, o_, lse_, do_):
        dq, dk, dv_, _ = flash_attention_backward(
            q_, k_, v_, None, o_, lse_, do_,
            scale=scale, is_causal=False, ds_handoff=True, config=cfg8,
        )
        return dq, jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv_.astype(jnp.float32))

    try:
        t = tc(bwd_fp8, q, k, v, o, lse, do)
        print(f"bwd_handoff_fp8 {t:8.2f} ms", flush=True)
    except Exception as exc:
        print(f"bwd_handoff_fp8 FAILED {str(exc)[:140]}", flush=True)


if __name__ == "__main__":
    main()
