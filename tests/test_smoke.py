"""Fast-tier kernel smoke: one tiny shape per major code path.

The heavy interpret-mode sweeps (test_ffpa_fwd / _bwd / _varlen /
test_features / ...) are marked ``slow``; this file keeps the fast tier
(``pytest -m 'not slow'``) honest on the kernel surface — forward,
backward, GQA, causal, varlen, decode, and one stacked-feature combo —
at shapes small enough for CPU interpret mode in seconds each.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

TOL = 5e-2


def _qkv(b, hq, hkv, nq, nkv, d, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(ks[0], (b, hq, nq, d), dtype=dtype),
        jax.random.normal(ks[1], (b, hkv, nkv, d), dtype=dtype),
        jax.random.normal(ks[2], (b, hkv, nkv, d), dtype=dtype),
    )


def _close(a, b, tol=TOL):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        atol=tol, rtol=tol,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_fwd_smoke(causal):
    q, k, v = _qkv(1, 2, 2, 256, 256, 320)
    ref = reference_attention(q, k, v, None, is_causal=causal)
    _close(ffpa_attn_func(q, k, v, is_causal=causal), ref)


def test_fwd_gqa_smoke():
    q, k, v = _qkv(1, 4, 1, 256, 256, 320)
    ref = reference_attention(
        q, expand_kv_heads(k, 4), expand_kv_heads(v, 4), None
    )
    _close(ffpa_attn_func(q, k, v, enable_gqa=True), ref)


def test_bwd_smoke():
    q, k, v = _qkv(1, 2, 2, 256, 256, 320)
    do = jax.random.normal(jax.random.PRNGKey(7), q.shape, q.dtype)

    def loss(fn):
        def inner(q_, k_, v_):
            return (
                fn(q_, k_, v_).astype(jnp.float32)
                * do.astype(jnp.float32)
            ).sum()

        return jax.grad(inner, argnums=(0, 1, 2))(q, k, v)

    got = loss(lambda a, b, c: ffpa_attn_func(a, b, c, is_causal=True))
    want = loss(
        lambda a, b, c: reference_attention(a, b, c, None, is_causal=True)
    )
    for g, w in zip(got, want):
        _close(g, w)


def test_decode_smoke():
    q, k, v = _qkv(1, 4, 1, 1, 512, 320)
    ref = reference_attention(
        q, expand_kv_heads(k, 4), expand_kv_heads(v, 4), None
    )
    _close(ffpa_attn_func(q, k, v, enable_gqa=True), ref)


def test_varlen_smoke():
    d = 320
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    t, h = 384, 2
    q = jax.random.normal(ks[0], (t, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (t, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (t, h, d), jnp.bfloat16)
    cu = jnp.asarray([0, 128, 384], jnp.int32)
    out = ffpa_attn_varlen_func(
        q, k, v, cu_seqlens_q=cu, cu_seqlens_k=cu,
        max_seqlen_q=256, max_seqlen_k=256, causal=True,
    )
    # Per-segment oracle.
    for lo, hi in ((0, 128), (128, 384)):
        qs = jnp.swapaxes(q[lo:hi], 0, 1)[None]
        ks_ = jnp.swapaxes(k[lo:hi], 0, 1)[None]
        vs = jnp.swapaxes(v[lo:hi], 0, 1)[None]
        ref = reference_attention(qs, ks_, vs, None, is_causal=True)
        _close(
            jnp.swapaxes(out[lo:hi], 0, 1),
            ref[0],
        )


def test_feature_combo_smoke():
    """Window + softcap through the public entry vs a masked oracle."""
    q, k, v = _qkv(1, 2, 2, 256, 256, 320)
    cap = 30.0
    got = ffpa_attn_func(
        q, k, v, is_causal=True, window_size=(64, -1), softcap=cap
    )
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    )
    s = cap * jnp.tanh(s / cap)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 1)
    s = jnp.where((cols <= rows) & (cols >= rows - 64), s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    _close(got, ref)
