"""Dissect the serving-tier e2e numbers (round-4: serve 85.9 tok/s at B=4
vs 712 single-stream — 33x per-sequence gap; speculative 8.6 tok/s).

Strategy: time each loop at TWO step counts and report the slope
(ms/step) — intercept (prefill + dispatch + epilogue) cancels, exactly
like cli/_bench.time_chained. Then time stripped variants to bisect:

* batched loop slope vs single-stream loop slope (same model config);
* a carry-only scan (cache DUS, no attention / no logits) — isolates
  scan-carry copy cost;
* a logits-only scan (embed matmul + vocab projection) — isolates the
  [B, 32000] x [32000, 1024] projection;
* speculative outer-iteration slope via iters=a vs iters=b.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_serving.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ffpa_attn_tpu.models import ModelConfig, init_params
from ffpa_attn_tpu.models.serving import (
    _batched_decode_loop_jit, pack_prompts, prefill_packed, serve_batch,
)
from ffpa_attn_tpu.models.generate import init_kv_cache


def _t(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def slope(fn_of_steps, a=16, b=64):
    ta = _t(lambda: fn_of_steps(a))
    tb = _t(lambda: fn_of_steps(b))
    return (tb - ta) / (b - a), ta, tb


def main():
    import os

    print(jax.devices(), flush=True)
    # Tiny-override for a CPU smoke run: FFPA_TPU_PROBE_TINY=1.
    if os.environ.get("FFPA_TPU_PROBE_TINY") == "1":
        vocab, dm, L, H, HKV, DH = 128, 64, 2, 2, 1, 320
        B, PROMPT, GEN = 2, 64, 16
        SA, SB = 4, 12
    else:
        vocab, dm, L, H, HKV, DH = 32000, 1024, 4, 8, 4, 512
        B, PROMPT, GEN = 4, 1024, 128
        SA, SB = 16, 64
    cfg = ModelConfig(
        vocab_size=vocab, d_model=dm, n_layers=L, n_heads=H,
        n_kv_heads=HKV, head_dim=DH, max_seq_len=PROMPT + GEN,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    lens = [PROMPT - int(rng.integers(0, PROMPT // 2)) for _ in range(B)]
    prompts = [
        jnp.asarray(rng.integers(0, vocab, (n,)), jnp.int32) for n in lens
    ]
    max_len = PROMPT + GEN

    # 1. full serve_batch at two gen lengths -> per-step slope
    def serve_steps(s):
        return serve_batch(params, prompts, s, cfg, max_len)

    ms, ta, tb = slope(serve_steps, a=SA, b=SB)
    print(f"serve_batch slope {ms:.2f} ms/step (t16={ta:.0f} t64={tb:.0f})",
          flush=True)

    # 2. the scanned loop alone (prefill excluded) at two step counts
    lens_arr = jnp.asarray(lens, jnp.int32)
    base = int(max(lens))
    packed, cu = pack_prompts(prompts, sum(lens))
    cache0 = init_kv_cache(cfg, B, max_len)
    logits, cache0 = prefill_packed(params, packed, cu, base, cfg, cache0)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    jax.block_until_ready(tok0)

    def loop_steps(s):
        return _batched_decode_loop_jit(
            params, cache0, lens_arr, tok0, cfg, s, base
        )

    ms, ta, tb = slope(loop_steps, a=SA, b=SB)
    print(f"batched_decode_loop slope {ms:.2f} ms/step "
          f"(t16={ta:.0f} t64={tb:.0f})", flush=True)

    # 3. carry-only scan: same cache carry + one-row DUS per layer, no
    # attention, no projections. If THIS is slow, scan carries copy.
    @functools.partial(jax.jit, static_argnames=("steps",))
    def carry_only(cache, steps: int):
        def body(c, _):
            cache, t = c
            for li in range(cfg.n_layers):
                row = jnp.zeros((B, HKV, 1, DH), cache[li]["k"].dtype)
                cache[li] = {
                    "k": jax.lax.dynamic_update_slice(
                        cache[li]["k"], row, (0, 0, base + t, 0)
                    ),
                    "v": jax.lax.dynamic_update_slice(
                        cache[li]["v"], row, (0, 0, base + t, 0)
                    ),
                }
            return (cache, t + 1), t

        (_, _), ts = jax.lax.scan(
            body, (cache, jnp.int32(0)), None, length=steps
        )
        return ts

    ms, ta, tb = slope(lambda s: carry_only(cache0, s), a=SA, b=SB)
    print(f"carry-only scan slope {ms:.2f} ms/step "
          f"(t16={ta:.0f} t64={tb:.0f})", flush=True)

    # 4. logits-only scan: embed + vocab projection, no cache.
    @functools.partial(jax.jit, static_argnames=("steps",))
    def logits_only(tok, steps: int):
        def body(tok, _):
            x = params["embed"][tok]  # [B, D]
            logits = x @ params["embed"].T
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), 0

        out, _ = jax.lax.scan(body, tok, None, length=steps)
        return out

    ms, ta, tb = slope(lambda s: logits_only(tok0, s), a=SA, b=SB)
    print(f"logits-only scan slope {ms:.2f} ms/step "
          f"(t16={ta:.0f} t64={tb:.0f})", flush=True)

    # 4b. raw decode-attention slope at the serve shape (B=4, bias) — a
    # scan of bare kernel calls over a fixed cache isolates the attention
    # from the transformer stack.
    from ffpa_attn_tpu.interface import ffpa_attn_func

    kq = jax.random.PRNGKey(7)
    q1 = jax.random.normal(kq, (B, H, 1, DH), jnp.bfloat16)
    kc = cache0[0]["k"]
    vc = cache0[0]["v"]
    cols = jnp.arange(max_len)[None, :]
    bias = jnp.where(
        cols < lens_arr[:, None], 0.0, -1e30
    ).astype(jnp.float32)[:, None, None, :]

    @functools.partial(jax.jit, static_argnames=("steps",))
    def attn_only(q1, steps: int):
        def body(q_, _):
            o = ffpa_attn_func(
                q_, kc, vc, attn_mask=bias,
                enable_gqa=H != HKV,
            )
            return o, 0

        out, _ = jax.lax.scan(body, q1, None, length=steps)
        return out

    ms, ta, tb = slope(lambda s: attn_only(q1, s), a=SA, b=SB)
    print(f"attn-only (B={B} bias decode) slope {ms:.2f} ms/step "
          f"(t16={ta:.0f} t64={tb:.0f})", flush=True)

    # 5. single-stream generate slope for the per-sequence comparison
    from ffpa_attn_tpu.models import generate as generate_fn

    prompt1 = jnp.asarray(
        rng.integers(0, vocab, (1, PROMPT)), jnp.int32
    )
    cfg1 = ModelConfig(
        vocab_size=vocab, d_model=dm, n_layers=L, n_heads=H,
        n_kv_heads=HKV, head_dim=DH, max_seq_len=PROMPT + GEN,
    )

    def gen_steps(s):
        return generate_fn(params, prompt1, s, cfg1)

    ms, ta, tb = slope(gen_steps, a=SA, b=SB)
    print(f"single-stream generate slope {ms:.2f} ms/step "
          f"(t16={ta:.0f} t64={tb:.0f})", flush=True)

    # 6. speculative outer-iteration slope (iters bounds the loop; with
    # acceptance ~1 each iteration emits k+1 tokens, so steps=a*(k+1)).
    from ffpa_attn_tpu.models import speculative_generate

    spec_max = PROMPT + SB * 2 + 4 + 2
    cfg_spec = ModelConfig(
        vocab_size=vocab, d_model=dm, n_layers=L, n_heads=H,
        n_kv_heads=HKV, head_dim=DH, max_seq_len=spec_max,
    )

    def spec_steps(s):
        return speculative_generate(
            params, params, prompt1, s, cfg_spec, cfg_spec,
            spec_max, k_spec=4,
        )

    ms, ta, tb = slope(spec_steps, a=SA, b=SB * 2)
    print(f"speculative slope {ms:.2f} ms/token "
          f"(ta={ta:.0f} tb={tb:.0f})", flush=True)


if __name__ == "__main__":
    main()
