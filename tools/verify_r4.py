"""Round-4 on-chip verify: drive the public surface with this round's
changes live — fp8-dS proposal (FFPA_TPU_ALLOW_FP8_DS=1 backward), the
new multiD tuned entries (D=640/768/1024 accumulator-split / fp8 picks),
and the device-log lane — against the fp32 oracle.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_r4.py
"""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

FAIL = []


def check(name, ok, detail=""):
    print(("PASS " if ok else "FAIL ") + name + (" " + detail if detail else ""), flush=True)
    if not ok:
        FAIL.append(name)


def close(a, b, tol):
    return float(
        np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
    ) < tol


def main():
    print(jax.devices(), flush=True)
    from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
    from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

    ks = jax.random.split(jax.random.PRNGKey(0), 4)

    def qkv(b, hq, hkv, nq, nkv, d, dtype=jnp.bfloat16):
        return (
            jax.random.normal(ks[0], (b, hq, nq, d), dtype),
            jax.random.normal(ks[1], (b, hkv, nkv, d), dtype),
            jax.random.normal(ks[2], (b, hkv, nkv, d), dtype),
        )

    # 1. causal large-D fwd vs oracle (uses the NEW d1024 tuned entry)
    q, k, v = qkv(1, 4, 4, 1024, 1024, 1024)
    ref = reference_attention(q, k, v, None, is_causal=True)
    out = ffpa_attn_func(q, k, v, is_causal=True)
    check("fwd d1024 causal vs oracle", close(out, ref, 5e-2))

    # 2. grad with fp8-dS proposal ON vs OFF vs oracle (D=640 hits the new
    # accumulator-split tuned entry; fp8 flag flips ds storage)
    q, k, v = qkv(1, 4, 4, 1024, 1024, 640)
    do = jax.random.normal(ks[3], q.shape, q.dtype)

    def grads(fn):
        def loss(q_, k_, v_):
            return (
                fn(q_, k_, v_).astype(jnp.float32) * do.astype(jnp.float32)
            ).sum()

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    want = grads(lambda a, b, c: reference_attention(a, b, c, None))
    got = grads(lambda a, b, c: ffpa_attn_func(a, b, c))
    ok = all(close(g, w, 5e-2) for g, w in zip(got, want))
    check("bwd d640 (accsplit tuned entry) vs oracle", ok)
    os.environ["FFPA_TPU_ALLOW_FP8_DS"] = "1"
    jax.clear_caches()
    got8 = grads(lambda a, b, c: ffpa_attn_func(a, b, c))
    ok = all(close(g, w, 6e-2) for g, w in zip(got8, want))
    check("bwd d640 fp8-dS opt-in vs oracle", ok)
    os.environ["FFPA_TPU_ALLOW_FP8_DS"] = "0"
    jax.clear_caches()

    # 3. decode + GQA + varlen
    q, k, v = qkv(1, 8, 2, 1, 2048, 512)
    ref = reference_attention(
        q, expand_kv_heads(k, 8), expand_kv_heads(v, 8), None
    )
    out = ffpa_attn_func(q, k, v, enable_gqa=True)
    check("decode gqa vs oracle", close(out, ref, 5e-2))

    # 3b. decode backward (round-4 composite vjp) vs oracle grads
    dod = jax.random.normal(ks[3], q.shape, q.dtype)

    def dgrads(fn):
        def loss(q_, k_, v_):
            return (
                fn(q_, k_, v_).astype(jnp.float32) * dod.astype(jnp.float32)
            ).sum()

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    got = dgrads(lambda a, b, c: ffpa_attn_func(a, b, c, enable_gqa=True))
    want = dgrads(
        lambda a, b, c: reference_attention(
            a, expand_kv_heads(b, 8), expand_kv_heads(c, 8), None
        )
    )
    # jax.grad differentiates through expand_kv_heads, so want's dk/dv
    # come back already group-reduced to the [B, Hkv, N, D] layout.
    check(
        "decode gqa grads vs oracle",
        all(close(g, w, 5e-2) for g, w in zip(got, want)),
    )

    t, h, d = 1024, 4, 512
    q3 = jax.random.normal(ks[0], (t, h, d), jnp.bfloat16)
    k3 = jax.random.normal(ks[1], (t, h, d), jnp.bfloat16)
    v3 = jax.random.normal(ks[2], (t, h, d), jnp.bfloat16)
    cu = jnp.asarray([0, 256, 1024], jnp.int32)
    out = ffpa_attn_varlen_func(
        q3, k3, v3, cu_seqlens_q=cu, cu_seqlens_k=cu,
        max_seqlen_q=768, max_seqlen_k=768, causal=True,
    )
    seg_ok = True
    for lo, hi in ((0, 256), (256, 1024)):
        ref = reference_attention(
            jnp.swapaxes(q3[lo:hi], 0, 1)[None],
            jnp.swapaxes(k3[lo:hi], 0, 1)[None],
            jnp.swapaxes(v3[lo:hi], 0, 1)[None],
            None, is_causal=True,
        )
        seg_ok = seg_ok and close(jnp.swapaxes(out[lo:hi], 0, 1), ref[0], 5e-2)
    check("varlen causal vs per-segment oracle", seg_ok)

    # 4. error taxonomy
    q, k, v = qkv(1, 2, 2, 256, 256, 512)
    try:
        ffpa_attn_func(q, k, v, bogus_kwarg=1)
        check("bogus kwarg -> TypeError", False)
    except TypeError:
        check("bogus kwarg -> TypeError", True)
    try:
        qq, kk, vv = qkv(1, 2, 2, 512, 256, 512)
        ffpa_attn_func(qq, kk, vv, is_causal=True)
        check("causal Nkv<Nq -> ValueError", False)
    except ValueError:
        check("causal Nkv<Nq -> ValueError", True)
    try:
        qg, kg, vg = qkv(1, 4, 2, 256, 256, 512)
        ffpa_attn_func(qg, kg, vg)
        check("head mismatch w/o enable_gqa -> ValueError", False)
    except ValueError:
        check("head mismatch w/o enable_gqa -> ValueError", True)
    qq, kk, vv = qkv(1, 2, 2, 256, 256, 1536)
    out = ffpa_attn_func(qq, kk, vv)
    check("D>1024 silent fallback finite", bool(jnp.isfinite(out.astype(jnp.float32)).all()))

    # 5. device-log lane compiles on REAL Mosaic (level 2; output goes to
    # the TPU log stream, not stdout — compile+run surviving is the check)
    os.environ["FFPA_TPU_DEVICE_LOG_LEVEL"] = "2"
    jax.clear_caches()
    try:
        q, k, v = qkv(1, 2, 2, 256, 256, 512)
        out = ffpa_attn_func(q, k, v)
        check("device-log level 2 compiles on Mosaic", bool(jnp.isfinite(out.astype(jnp.float32)).all()))
    except Exception as exc:
        check("device-log level 2 compiles on Mosaic", False, str(exc)[:200])
    os.environ["FFPA_TPU_DEVICE_LOG_LEVEL"] = "0"

    print(("VERIFY FAIL: " + ", ".join(FAIL)) if FAIL else "VERIFY OK", flush=True)
    return 1 if FAIL else 0


if __name__ == "__main__":
    sys.exit(main())
