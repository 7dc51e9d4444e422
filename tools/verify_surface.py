"""Drive FFPA-TPU's public surface on the attached chip (verify skill).

Covers: causal large-D fwd vs oracle, jax.grad (incl. explicit
save_scores backends), decode, varlen, GQA, fp16 contract, and the error
taxonomy. Prints PASS/FAIL lines; exits nonzero on any FAIL.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import ffpa_attn_tpu
from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
from ffpa_attn_tpu.functional import PallasBackend
from ffpa_attn_tpu.ops.reference import (
    expand_kv_heads,
    reference_attention,
)

FAILS = []


def check(name, ok, detail=""):
    print(("PASS" if ok else "FAIL"), name, detail, flush=True)
    if not ok:
        FAILS.append(name)


def rel(a, b):
    a = np.asarray(jax.device_get(a), np.float32)
    b = np.asarray(jax.device_get(b), np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def make(b, hq, hkv, nq, nkv, d, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, hq, nq, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, nkv, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, nkv, d), dtype)
    do = jax.random.normal(ks[3], (b, hq, nq, d), dtype)
    return q, k, v, do


def main():
    print("devices:", jax.devices(), flush=True)

    # 1. causal large-D fwd vs oracle (bf16)
    q, k, v, do = make(1, 4, 4, 1024, 1024, 512)
    out = jax.jit(lambda *a: ffpa_attn_func(*a, is_causal=True))(q, k, v)
    ref = reference_attention(q, k, v, None, is_causal=True, scale=512**-0.5)
    check("causal_fwd_bf16", rel(out, ref) < 5e-2, f"rel={rel(out, ref):.4f}")

    # 2. grads through both residual policies
    for ss in (False, True):
        def f(q_, k_, v_, ss=ss):
            return (
                ffpa_attn_func(
                    q_, k_, v_, is_causal=True,
                    backward_backend=PallasBackend(save_scores=ss),
                ).astype(jnp.float32)
                * do.astype(jnp.float32)
            ).sum()

        def fr(q_, k_, v_):
            return (
                reference_attention(
                    q_, k_, v_, None, is_causal=True, scale=512**-0.5
                ).astype(jnp.float32)
                * do.astype(jnp.float32)
            ).sum()

        g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        worst = max(rel(a, b) for a, b in zip(g, gr))
        check(
            f"grad_save_scores={ss}",
            worst < 5e-2 and all(x.dtype == q.dtype for x in g),
            f"worst_rel={worst:.4f}",
        )

    # 3a. decode Nq=1
    q1, k1, v1, _ = make(1, 8, 8, 1, 4096, 512, seed=1)
    out = jax.jit(ffpa_attn_func)(q1, k1, v1)
    ref = reference_attention(q1, k1, v1, None, scale=512**-0.5)
    check("decode_nq1", rel(out, ref) < 5e-2, f"rel={rel(out, ref):.4f}")

    # 3b. GQA
    qg, kg, vg, _ = make(1, 8, 2, 1024, 1024, 512, seed=2)
    out = jax.jit(
        lambda *a: ffpa_attn_func(*a, is_causal=True, enable_gqa=True)
    )(qg, kg, vg)
    ref = reference_attention(
        qg, expand_kv_heads(kg, 8), expand_kv_heads(vg, 8), None,
        is_causal=True, scale=512**-0.5,
    )
    check("gqa", rel(out, ref) < 5e-2, f"rel={rel(out, ref):.4f}")

    # 3c. varlen
    t, h, d = 1024, 4, 512
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    qv = jax.random.normal(ks[0], (t, h, d), jnp.bfloat16)
    kv = jax.random.normal(ks[1], (t, h, d), jnp.bfloat16)
    vv = jax.random.normal(ks[2], (t, h, d), jnp.bfloat16)
    cu = jnp.asarray([0, 300, 700, 1024], jnp.int32)
    out = ffpa_attn_varlen_func(qv, kv, vv, cu, cu, 512, 512, causal=True)
    ok = True
    worst = 0.0
    for s in range(3):
        lo, hi = int(cu[s]), int(cu[s + 1])
        ref = reference_attention(
            qv[None, lo:hi].transpose(0, 2, 1, 3),
            kv[None, lo:hi].transpose(0, 2, 1, 3),
            vv[None, lo:hi].transpose(0, 2, 1, 3),
            None, is_causal=True, scale=d**-0.5,
        )
        got = out[None, lo:hi].transpose(0, 2, 1, 3)
        worst = max(worst, rel(got, ref))
        ok = ok and rel(got, ref) < 5e-2
    check("varlen", ok, f"worst_rel={worst:.4f}")

    # 3d. fp16 contract (1e-2) — incl. save_scores=True being ignored
    qf, kf, vf, dof = make(1, 4, 4, 1024, 1024, 512, jnp.float16, seed=4)
    outf, vjp = jax.vjp(
        jax.jit(
            lambda *a: ffpa_attn_func(
                *a, is_causal=True,
                backward_backend=PallasBackend(save_scores=True),
            )
        ),
        qf, kf, vf,
    )
    reff, vjp_r = jax.vjp(
        lambda *a: reference_attention(
            *a, None, is_causal=True, scale=512**-0.5
        ),
        qf, kf, vf,
    )
    got = vjp(dof)
    want = vjp_r(dof.astype(reff.dtype))
    worst = max(rel(a, b) for a, b in zip(got, want))
    check(
        "fp16_contract_save_scores_ignored",
        rel(outf, reff) < 1e-2 and worst < 1e-2,
        f"fwd={rel(outf, reff):.5f} worst_grad={worst:.5f}",
    )

    # 4. error taxonomy
    try:
        ffpa_attn_func(q, k, v, bogus_kwarg=1)
        check("err_bogus_kwarg", False)
    except TypeError:
        check("err_bogus_kwarg", True)
    try:
        ffpa_attn_func(q, k[:, :, :512], v[:, :, :512], is_causal=True)
        check("err_causal_short_kv", False)
    except ValueError:
        check("err_causal_short_kv", True)
    try:
        ffpa_attn_func(qg, kg, vg)  # head mismatch, no enable_gqa
        check("err_head_mismatch", False)
    except ValueError:
        check("err_head_mismatch", True)
    qb, kb, vb, _ = make(1, 2, 2, 256, 256, 1088, seed=5)
    out = ffpa_attn_func(qb, kb, vb)
    check("d_gt_1024_fallback", bool(jnp.isfinite(out).all()))

    print("FAILURES:", FAILS, flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
