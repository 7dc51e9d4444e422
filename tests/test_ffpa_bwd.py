"""Backward correctness: dQ/dK/dV/dBias vs the fp32 oracle's autodiff.

Mirrors reference tests/test_ffpa_bwd.py coverage: causal/non-causal,
GQA/MQA, cross-attn, bias grads, dropout replay. Tolerances: fp16 1e-2,
bf16 5e-2 (reference tests/test_ffpa_bwd.py:38-46).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffpa_attn_tpu import ffpa_attn_func
from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

TOL = {jnp.float16: 1e-2, jnp.bfloat16: 5e-2}


def _make(b, hq, hkv, nq, nkv, d, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, hq, nq, d), dtype=dtype)
    k = jax.random.normal(ks[1], (b, hkv, nkv, d), dtype=dtype)
    v = jax.random.normal(ks[2], (b, hkv, nkv, d), dtype=dtype)
    do = jax.random.normal(ks[3], (b, hq, nq, d), dtype=dtype)
    return q, k, v, do


def _grads(fn, args, do):
    out, vjp = jax.vjp(fn, *args)
    return vjp(do.astype(out.dtype))


def _assert_close(got, want, dtype, name):
    tol = TOL[dtype]
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        atol=tol,
        rtol=tol,
        err_msg=name,
    )


@pytest.mark.parametrize(
    "shape",
    [
        (1, 2, 2, 256, 256, 320),
        (1, 2, 2, 256, 256, 512),
        (1, 2, 1, 256, 256, 640),  # GQA
        (1, 2, 2, 128, 384, 512),  # cross-attn
        (1, 2, 2, 250, 250, 320),  # non-aligned
    ],
)
@pytest.mark.parametrize("causal", [False, True])
def test_bwd_vs_oracle(shape, causal):
    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = shape
    q, k, v, do = _make(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    gqa = hq != hkv

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, is_causal=causal, enable_gqa=gqa)

    def oracle(q_, k_, v_):
        return reference_attention(
            q_,
            expand_kv_heads(k_, hq),
            expand_kv_heads(v_, hq),
            None,
            is_causal=causal,
            scale=scale,
        )

    dq, dk, dv = _grads(ffpa, (q, k, v), do)
    dq_r, dk_r, dv_r = _grads(oracle, (q, k, v), do)
    _assert_close(dq, dq_r, dtype, "dq")
    _assert_close(dk, dk_r, dtype, "dk")
    _assert_close(dv, dv_r, dtype, "dv")


@pytest.mark.parametrize("mask_shape", ["full", "key_only"])
def test_bwd_bias_grad(mask_shape):
    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = 1, 2, 2, 256, 256, 320
    q, k, v, do = _make(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    key = jax.random.PRNGKey(5)
    shape = (b, hq, nq, nkv) if mask_shape == "full" else (1, 1, 1, nkv)
    bias = jax.random.normal(key, shape, dtype=jnp.float32)

    def ffpa(q_, k_, v_, bias_):
        return ffpa_attn_func(q_, k_, v_, attn_mask=bias_)

    def oracle(q_, k_, v_, bias_):
        return reference_attention(q_, k_, v_, bias_, scale=scale)

    got = _grads(ffpa, (q, k, v, bias), do)
    want = _grads(oracle, (q, k, v, bias), do)
    for g, w, name in zip(got, want, ["dq", "dk", "dv", "dbias"]):
        _assert_close(g, w, dtype, name)


def test_bwd_dropout_replay():
    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = 1, 2, 2, 256, 256, 320
    q, k, v, do = _make(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, dropout_p=0.25, dropout_seed=99)

    def oracle(q_, k_, v_):
        return reference_attention(
            q_, k_, v_, None, scale=scale, dropout_p=0.25, dropout_seed=99
        )

    got = _grads(ffpa, (q, k, v), do)
    want = _grads(oracle, (q, k, v), do)
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        _assert_close(g, w, dtype, name)


def test_bwd_sdpa_backend():
    """backward_backend='sdpa' routes to the fp32 recompute path."""
    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = 1, 2, 2, 256, 256, 320
    q, k, v, do = _make(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, backward_backend="sdpa")

    def oracle(q_, k_, v_):
        return reference_attention(q_, k_, v_, None, scale=scale)

    got = _grads(ffpa, (q, k, v), do)
    want = _grads(oracle, (q, k, v), do)
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        _assert_close(g, w, dtype, name)


def test_bwd_grad_storage_dtype():
    from ffpa_attn_tpu import PallasBackend

    dtype = jnp.bfloat16
    q, k, v, do = _make(1, 2, 2, 256, 256, 320, dtype)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(
            q_,
            k_,
            v_,
            backward_backend=PallasBackend(grad_kv_storage_dtype="f32"),
        )

    dq, dk, dv = _grads(ffpa, (q, k, v), do)
    assert dk.dtype == jnp.float32
    assert dv.dtype == jnp.float32
    assert dq.dtype == dtype
