"""Extension features: softcap, sliding-window, ALiBi — fwd + bwd vs oracle.

The GPU reference REJECTS these kwargs with a consolidated
NotImplementedError (reference: src/ffpa_attn/cute/__init__.py:65-125 —
``window_size``, ``softcap``, ``alibi_slopes``); FFPA-TPU implements them
natively in the Pallas kernels:

* softcap: ``s = cap * tanh(s / cap)`` on the scaled logits, chain factor
  ``1 - (s/cap)^2`` in every backward scheme (flash_bwd._recompute_ds and
  the from-S kernel).
* window_size: band masking + two-sided tile skipping with DMA-eliding
  index clamps (O(N*W) compute AND bandwidth).
* alibi_slopes: per-head ``-slope * |p - col|`` computed in-kernel from
  iota + an SMEM slope table — no N^2 bias tensor.

The oracle (ops/reference.py) defines the numerics contract; the
window-vs-bool-mask test additionally proves the band semantics against
the long-standing additive-mask path, independent of the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy interpret-mode sweeps: slow tier (fast tier: pytest -m 'not slow').
pytestmark = pytest.mark.slow

from ffpa_attn_tpu import PallasBackend, ffpa_attn_func
from ffpa_attn_tpu.ops.reference import reference_attention, expand_kv_heads


def _mk(b, hq, hkv, nq, nkv, d, seed=0, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, hq, nq, d), dtype=dtype)
    k = jax.random.normal(kk, (b, hkv, nkv, d), dtype=dtype)
    v = jax.random.normal(kv, (b, hkv, nkv, d), dtype=dtype)
    do = jax.random.normal(kd, (b, hq, nq, d), dtype=dtype)
    return q, k, v, do


def _assert_close(got, ref, tol, what=""):
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    err = np.max(np.abs(g - r))
    rel = err / (np.max(np.abs(r)) + 1e-9)
    assert rel < tol, f"{what}: rel err {rel:.4f} >= {tol}"


def _ref_fn(rkw, hq):
    def fn(q, k, v):
        return reference_attention(
            q.astype(jnp.float32),
            expand_kv_heads(k, hq).astype(jnp.float32),
            expand_kv_heads(v, hq).astype(jnp.float32),
            **rkw,
        ).astype(q.dtype)

    return fn


FEATURE_CASES = [
    ("softcap", dict(softcap=20.0), dict(softcap=20.0)),
    ("window", dict(window_size=(96, 32)), dict(window=(96, 32))),
    ("window-int-pair", dict(window_size=(64, 0)), dict(window=(64, 0))),
    (
        "window-causal",
        dict(window_size=(128, -1), is_causal=True),
        dict(window=(128, -1), is_causal=True),
    ),
    (
        "alibi",
        dict(alibi_slopes=np.array([0.02, 0.07], np.float32)),
        dict(alibi_slopes=jnp.asarray([0.02, 0.07], jnp.float32)),
    ),
    (
        "softcap-alibi",
        dict(softcap=15.0, alibi_slopes=np.array([0.02, 0.07], np.float32)),
        dict(softcap=15.0, alibi_slopes=jnp.asarray([0.02, 0.07], jnp.float32)),
    ),
    (
        "softcap-window",
        dict(softcap=15.0, window_size=(96, 32)),
        dict(softcap=15.0, window=(96, 32)),
    ),
]


@pytest.mark.parametrize("name,fkw,rkw", FEATURE_CASES, ids=[c[0] for c in FEATURE_CASES])
def test_feature_forward(name, fkw, rkw):
    q, k, v, _ = _mk(1, 2, 2, 512, 512, 320)
    out = ffpa_attn_func(q, k, v, **fkw)
    ref = reference_attention(q, k, v, **rkw)
    _assert_close(out, ref, 3e-2, f"{name} fwd")


@pytest.mark.parametrize("name,fkw,rkw", FEATURE_CASES, ids=[c[0] for c in FEATURE_CASES])
def test_feature_backward(name, fkw, rkw):
    hq = 2
    q, k, v, do = _mk(1, hq, hq, 512, 512, 320, seed=1)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(loss(lambda a, b, c: ffpa_attn_func(a, b, c, **fkw)),
                   argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss(_ref_fn(rkw, hq)), argnums=(0, 1, 2))(q, k, v)
    for n, g, r in zip("qkv", got, ref):
        _assert_close(g, r, 6e-2, f"{name} d{n}")


def test_window_matches_bool_mask_path():
    """Band semantics locked against the additive-mask path (not just the
    oracle): a window call must agree with the identical explicit mask."""
    q, k, v, _ = _mk(1, 2, 2, 512, 512, 320, seed=2)
    n = 512
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    band = (cols <= rows + 32) & (cols >= rows - 96)
    out_m = ffpa_attn_func(q, k, v, attn_mask=band)
    out_w = ffpa_attn_func(q, k, v, window_size=(96, 32))
    np.testing.assert_allclose(
        np.asarray(out_w, np.float32), np.asarray(out_m, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_window_cross_attention_tail_aligned():
    """Cross-attn window anchors to the tail-aligned diagonal (p = m +
    Nkv - Nq), matching the causal convention."""
    q, k, v, _ = _mk(1, 2, 2, 256, 512, 320, seed=3)
    out = ffpa_attn_func(q, k, v, window_size=(64, 64))
    ref = reference_attention(q, k, v, window=(64, 64))
    _assert_close(out, ref, 3e-2, "cross window fwd")


def test_alibi_matches_explicit_bias():
    """ALiBi computed in-kernel == the same bias materialized as a tensor
    through the mask path."""
    b, h, n, d = 1, 4, 384, 320
    q, k, v, _ = _mk(b, h, h, n, n, d, seed=4)
    slopes = jnp.asarray(np.geomspace(1 / 8, 1.0, h), jnp.float32) * 0.05
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    dist = jnp.abs(rows - cols).astype(jnp.float32)
    bias = -slopes[None, :, None, None] * dist[None, None]
    out_b = ffpa_attn_func(q, k, v, attn_mask=bias)
    out_a = ffpa_attn_func(q, k, v, alibi_slopes=slopes)
    np.testing.assert_allclose(
        np.asarray(out_a, np.float32), np.asarray(out_b, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_alibi_per_batch_and_gqa():
    b, hq, hkv, n, d = 2, 4, 2, 384, 320
    q, k, v, do = _mk(b, hq, hkv, n, n, d, seed=5)
    slopes = jnp.asarray(
        np.linspace(0.01, 0.1, b * hq).reshape(b, hq), jnp.float32
    )
    out = ffpa_attn_func(q, k, v, enable_gqa=True, alibi_slopes=slopes)
    ref = reference_attention(
        q, expand_kv_heads(k, hq), expand_kv_heads(v, hq),
        alibi_slopes=slopes,
    )
    _assert_close(out, ref, 3e-2, "alibi gqa fwd")

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(
        loss(lambda a, b_, c: ffpa_attn_func(
            a, b_, c, enable_gqa=True, alibi_slopes=slopes
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref_g = jax.grad(
        loss(_ref_fn(dict(alibi_slopes=slopes), hq)), argnums=(0, 1, 2)
    )(q, k, v)
    # jax.grad of _ref_fn differentiates through expand_kv_heads -> dk/dv
    # come back [B, Hq, N, D]; group-reduce to compare.
    from ffpa_attn_tpu.ops.reference import reduce_q_heads

    ref_g = (ref_g[0], reduce_q_heads(ref_g[1], hkv), reduce_q_heads(ref_g[2], hkv))
    for n_, g, r in zip("qkv", got, ref_g):
        _assert_close(g, r, 6e-2, f"alibi gqa d{n_}")


def test_window_gqa_dropout_backward():
    """Window composes with GQA and dropout (dropout replay must see the
    same global ids the forward hashed)."""
    b, hq, hkv, n, d = 1, 4, 2, 512, 320
    q, k, v, do = _mk(b, hq, hkv, n, n, d, seed=6)
    fkw = dict(enable_gqa=True, window_size=(96, 32), dropout_p=0.2)
    rkw = dict(window=(96, 32), dropout_p=0.2)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(
        loss(lambda a, b_, c: ffpa_attn_func(a, b_, c, **fkw)),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref = jax.grad(loss(_ref_fn(rkw, hq)), argnums=(0, 1, 2))(q, k, v)
    from ffpa_attn_tpu.ops.reference import reduce_q_heads

    ref = (ref[0], reduce_q_heads(ref[1], hkv), reduce_q_heads(ref[2], hkv))
    for n_, g, r in zip("qkv", got, ref):
        _assert_close(g, r, 6e-2, f"window gqa dropout d{n_}")


def test_softcap_bias_dbias():
    """softcap + bias forces the recompute backward, where dBias is the
    POST-bias gradient (no tanh chain factor) while dQ/dK carry it."""
    b, h, n, d = 1, 2, 384, 320
    q, k, v, do = _mk(b, h, h, n, n, d, seed=7)
    bias = jax.random.normal(jax.random.PRNGKey(8), (1, 1, n, n), jnp.float32)

    def got_fn(q_, b_):
        return jnp.sum(
            ffpa_attn_func(q_, k, v, attn_mask=b_, softcap=20.0).astype(jnp.float32)
            * do.astype(jnp.float32)
        )

    def ref_fn(q_, b_):
        return jnp.sum(
            reference_attention(
                q_.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), b_, softcap=20.0,
            ) * do.astype(jnp.float32)
        )

    got = jax.grad(got_fn, argnums=(0, 1))(q, bias)
    ref = jax.grad(ref_fn, argnums=(0, 1))(q, bias)
    _assert_close(got[0], ref[0], 6e-2, "softcap+bias dq")
    _assert_close(got[1], ref[1], 6e-2, "softcap+bias dbias")


def test_softcap_from_s_residency():
    """Forced S-residency with softcap (bias/alibi-free): the from-S kernel
    recovers the tanh chain factor from the saved post-cap scores."""
    q, k, v, do = _mk(1, 2, 2, 512, 512, 320, seed=9)
    be = PallasBackend(save_scores=True)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(
        loss(lambda a, b, c: ffpa_attn_func(a, b, c, softcap=20.0, backend=be)),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref = jax.grad(loss(_ref_fn(dict(softcap=20.0), 2)), argnums=(0, 1, 2))(q, k, v)
    for n_, g, r in zip("qkv", got, ref):
        _assert_close(g, r, 6e-2, f"softcap from-S d{n_}")


def test_features_under_jit():
    q, k, v, _ = _mk(1, 2, 2, 384, 384, 320, seed=10)
    slopes = jnp.asarray([0.02, 0.07], jnp.float32)

    @jax.jit
    def f(q_, k_, v_, s_):
        return ffpa_attn_func(
            q_, k_, v_, is_causal=True, softcap=25.0,
            window_size=(128, -1), alibi_slopes=s_,
        )

    out = f(q, k, v, slopes)
    ref = reference_attention(
        q, k, v, is_causal=True, softcap=25.0, window=(128, -1),
        alibi_slopes=slopes,
    )
    _assert_close(out, ref, 3e-2, "jit combined fwd")
    # jit of the grad too
    g = jax.jit(jax.grad(lambda q_: jnp.sum(f(q_, k, v, slopes).astype(jnp.float32))))(q)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_fp16_window_softcap():
    """f16 public path (bf16 compute inside custom_vjp) holds for features."""
    q, k, v, _ = _mk(1, 2, 2, 384, 384, 320, seed=11, dtype=jnp.float16)
    out = ffpa_attn_func(q, k, v, softcap=20.0, window_size=(96, 32))
    assert out.dtype == jnp.float16
    ref = reference_attention(q, k, v, softcap=20.0, window=(96, 32))
    _assert_close(out, ref, 2e-2, "fp16 feature fwd")


def test_decode_shape_routes_dense_with_features():
    """Nq=1 with a window skips the decode fast path and still matches."""
    q, k, v, _ = _mk(1, 2, 2, 1, 1024, 320, seed=12)
    out = ffpa_attn_func(q, k, v, window_size=(256, -1), is_causal=True)
    ref = reference_attention(q, k, v, window=(256, -1), is_causal=True)
    _assert_close(out, ref, 3e-2, "decode window fwd")


def test_validation_errors():
    q, k, v, _ = _mk(1, 2, 2, 256, 256, 320)
    with pytest.raises(ValueError, match="softcap"):
        ffpa_attn_func(q, k, v, softcap=-1.0)
    with pytest.raises(ValueError, match="window_size"):
        ffpa_attn_func(q, k, v, window_size=(-2, 5))
    with pytest.raises(ValueError, match="alibi_slopes"):
        ffpa_attn_func(q, k, v, alibi_slopes=np.ones((3,), np.float32))
    qq = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 512, 320), jnp.bfloat16)
    with pytest.raises(ValueError, match="Nkv >= Nq"):
        ffpa_attn_func(qq, k, v, window_size=(64, 64))


def test_dpa_patch_local_window_size():
    """The jax.nn.dot_product_attention monkey-patch maps
    local_window_size onto the native window path (same band semantics)."""
    from ffpa_attn_tpu.interface import (
        patch_dot_product_attention,
        unpatch_dot_product_attention,
    )

    b, n, h, d = 1, 512, 2, 320
    key = jax.random.PRNGKey(13)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
    expected = jax.nn.dot_product_attention(
        q, k, v, is_causal=True, local_window_size=(128, 0)
    )
    patch_dot_product_attention()
    try:
        got = jax.nn.dot_product_attention(
            q, k, v, is_causal=True, local_window_size=(128, 0)
        )
    finally:
        unpatch_dot_product_attention()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_decode_window_kernel():
    """Windowed decode goes through the decode fast path: KV index clamps
    make a long-cache windowed decode O(W) (Mistral serving shape)."""
    from ffpa_attn_tpu.ops.decode import _decode_forward

    b, hq, hkv, nkv, d = 1, 8, 2, 4096, 512
    key = jax.random.PRNGKey(20)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, 1, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, nkv, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, nkv, d), jnp.bfloat16)
    o, _ = _decode_forward(
        q, k, v, None, scale=d ** -0.5, is_causal=True, window=(512, -1)
    )
    ref = reference_attention(
        q, expand_kv_heads(k, hq), expand_kv_heads(v, hq),
        is_causal=True, window=(512, -1), scale=d ** -0.5,
    )
    _assert_close(o, ref, 3e-2, "decode window")


def test_decode_softcap_speculative():
    """softcap + window through the public API at a speculative tail
    (Nq=4) — still the decode kernel, grads via the dense kernels."""
    b, hq, hkv, nkv, d = 1, 4, 2, 2048, 320
    key = jax.random.PRNGKey(21)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, 4, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, nkv, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, nkv, d), jnp.bfloat16)
    out = ffpa_attn_func(
        q, k, v, is_causal=True, enable_gqa=True, softcap=30.0,
        window_size=(512, -1),
    )
    ref = reference_attention(
        q, expand_kv_heads(k, hq), expand_kv_heads(v, hq),
        is_causal=True, softcap=30.0, window=(512, -1),
    )
    _assert_close(out, ref, 3e-2, "decode spec softcap+window")
    g = jax.grad(lambda q_: jnp.sum(ffpa_attn_func(
        q_, k, v, is_causal=True, enable_gqa=True, softcap=30.0,
        window_size=(512, -1),
    ).astype(jnp.float32)))(q)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_sinks_forward_and_grads():
    """Attention sinks (gpt-oss-style): sink-inclusive softmax via an LSE
    rescale; gradient flows to the sink logits in closed form
    (ops/attention.py:_apply_sinks)."""
    b, h, n, d = 1, 4, 512, 320
    q, k, v, do = _mk(b, h, h, n, n, d, seed=30)
    sinks = jnp.asarray([0.5, -0.2, 1.0, 0.0], jnp.float32)
    out = ffpa_attn_func(q, k, v, is_causal=True, sinks=sinks)
    ref = reference_attention(q, k, v, is_causal=True, sinks=sinks)
    _assert_close(out, ref, 3e-2, "sinks fwd")

    def loss(fn):
        return lambda q_, k_, v_, s_: jnp.sum(
            fn(q_, k_, v_, s_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(
        loss(lambda a, b_, c, s: ffpa_attn_func(a, b_, c, is_causal=True, sinks=s)),
        argnums=(0, 1, 2, 3),
    )(q, k, v, sinks)
    ref_g = jax.grad(
        loss(lambda a, b_, c, s: reference_attention(
            a.astype(jnp.float32), b_.astype(jnp.float32),
            c.astype(jnp.float32), is_causal=True, sinks=s,
        ).astype(jnp.bfloat16)),
        argnums=(0, 1, 2, 3),
    )(q, k, v, sinks)
    for n_, g, r in zip(["dq", "dk", "dv", "dsinks"], got, ref_g):
        _assert_close(g, r, 6e-2, f"sinks {n_}")


def test_sinks_window_decode_gpt_oss_shape():
    """sinks + sliding window at Nq=1 — the gpt-oss serving combination,
    on the decode fast path."""
    b, h, nkv, d = 1, 4, 2048, 320
    q, k, v, _ = _mk(b, h, h, 1, nkv, d, seed=31)
    sinks = jnp.asarray([0.3, 0.0, -0.5, 1.2], jnp.float32)
    out = ffpa_attn_func(
        q, k, v, is_causal=True, window_size=(512, -1), sinks=sinks
    )
    ref = reference_attention(
        q, k, v, is_causal=True, window=(512, -1), sinks=sinks
    )
    _assert_close(out, ref, 3e-2, "decode window+sinks")


def test_sinks_dropout_from_s():
    """sinks compose with dropout and the S-resident backward: residuals
    carry the sink-inclusive LSE, so every scheme is exact unchanged."""
    b, h, n, d = 1, 2, 384, 320
    q, k, v, do = _mk(b, h, h, n, n, d, seed=32)
    sinks = jnp.asarray([0.4, -0.1], jnp.float32)
    be = PallasBackend(save_scores=True)

    def loss(fn):
        return lambda q_, s_: jnp.sum(
            fn(q_, s_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(
        loss(lambda q_, s_: ffpa_attn_func(
            q_, k, v, dropout_p=0.1, sinks=s_, backend=be
        )),
        argnums=(0, 1),
    )(q, sinks)
    ref_g = jax.grad(
        loss(lambda q_, s_: reference_attention(
            q_.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), dropout_p=0.1, sinks=s_,
        ).astype(jnp.bfloat16)),
        argnums=(0, 1),
    )(q, sinks)
    _assert_close(got[0], ref_g[0], 6e-2, "sinks dropout dq")
    _assert_close(got[1], ref_g[1], 6e-2, "sinks dropout dsinks")


def test_sinks_validation():
    q, k, v, _ = _mk(1, 2, 2, 256, 256, 320)
    with pytest.raises(ValueError, match="sinks"):
        ffpa_attn_func(q, k, v, sinks=jnp.ones((3,), jnp.float32))


# ---------------------------------------------------------------------------
# Varlen features: the reference rejects these kwargs on the varlen entry
# too; FFPA-TPU applies them per segment via the same metadata the
# segment-ID mask already uses.
# ---------------------------------------------------------------------------


def _varlen_inputs(seed=40):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    t, h, hkv, d = 768, 4, 2, 320
    q = jax.random.normal(ks[0], (t, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (t, hkv, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (t, hkv, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (t, h, d), jnp.bfloat16)
    cu = jnp.asarray([0, 300, 512, 768], jnp.int32)
    return q, k, v, do, cu


def _varlen_seg_ref(q, k, v, cu, hq, rkw):
    """Per-segment dense oracle (window/alibi are segment-relative)."""
    outs = []
    for i in range(cu.shape[0] - 1):
        lo, hi = int(cu[i]), int(cu[i + 1])
        qq = q[None, lo:hi].transpose(0, 2, 1, 3)
        kk = expand_kv_heads(k[None, lo:hi].transpose(0, 2, 1, 3), hq)
        vv = expand_kv_heads(v[None, lo:hi].transpose(0, 2, 1, 3), hq)
        o = reference_attention(qq, kk, vv, **rkw)
        outs.append(o[0].transpose(1, 0, 2))
    return jnp.concatenate(outs, axis=0)


VARLEN_FEATURE_CASES = [
    ("window", dict(window_size=(64, 32), causal=False), dict(window=(64, 32))),
    (
        "window-causal",
        dict(window_size=(96, -1), causal=True),
        dict(window=(96, -1), is_causal=True),
    ),
    ("softcap", dict(softcap=20.0, causal=True), dict(softcap=20.0, is_causal=True)),
]


@pytest.mark.parametrize(
    "name,fkw,rkw", VARLEN_FEATURE_CASES, ids=[c[0] for c in VARLEN_FEATURE_CASES]
)
def test_varlen_feature_forward(name, fkw, rkw):
    from ffpa_attn_tpu import ffpa_attn_varlen_func

    q, k, v, _, cu = _varlen_inputs()
    out = ffpa_attn_varlen_func(q, k, v, cu, cu, 468, 468, enable_gqa=True, **fkw)
    ref = _varlen_seg_ref(q, k, v, cu, 4, rkw)
    _assert_close(out, ref, 3e-2, f"varlen {name} fwd")


def test_varlen_combo_backward():
    """softcap + window + alibi + sinks through the varlen backward, grads
    (incl. dsinks) vs the per-segment fp32 oracle vjp."""
    from ffpa_attn_tpu import ffpa_attn_varlen_func

    q, k, v, do, cu = _varlen_inputs(seed=41)
    sl = jnp.asarray([0.01, 0.03, 0.05, 0.07], jnp.float32)
    sinks = jnp.asarray([0.4, -0.1, 0.8, 0.0], jnp.float32)

    def loss_ffpa(q_, k_, v_, s_):
        return jnp.sum(
            ffpa_attn_varlen_func(
                q_, k_, v_, cu, cu, 468, 468, enable_gqa=True, causal=True,
                softcap=25.0, window_size=(128, -1), alibi_slopes=sl, sinks=s_,
            ).astype(jnp.float32) * do.astype(jnp.float32)
        )

    def loss_ref(q_, k_, v_, s_):
        out = _varlen_seg_ref(
            q_.astype(jnp.float32), k_.astype(jnp.float32),
            v_.astype(jnp.float32), cu, 4,
            dict(is_causal=True, softcap=25.0, window=(128, -1),
                 alibi_slopes=sl, sinks=s_),
        )
        return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))

    got = jax.grad(loss_ffpa, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    for n_, g, r in zip(["dq", "dk", "dv", "dsinks"], got, ref):
        _assert_close(g, r, 6e-2, f"varlen combo {n_}")


def test_varlen_still_rejects_unsupported():
    from ffpa_attn_tpu import ffpa_attn_varlen_func

    q, k, v, _, cu = _varlen_inputs()
    with pytest.raises(NotImplementedError, match="block_table"):
        ffpa_attn_varlen_func(
            q, k, v, cu, cu, 468, 468, block_table=jnp.zeros((1,), jnp.int32)
        )


def test_fp16_feature_gradient_contract():
    """The reference's fp16 gradient contract (atol=rtol=1e-2,
    tests/test_ffpa_bwd.py:43-46) holds with softcap + window + sinks
    combined — the hi+lo dV split and the feature chain factors coexist."""
    q, k, v, do = _mk(1, 2, 2, 384, 384, 320, seed=60, dtype=jnp.float16)
    sinks = jnp.asarray([0.3, -0.1], jnp.float32)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(
        loss(lambda a, b, c: ffpa_attn_func(
            a, b, c, is_causal=True, softcap=25.0, window_size=(96, -1),
            sinks=sinks,
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref = jax.grad(
        loss(lambda a, b, c: reference_attention(
            a.astype(jnp.float32), b.astype(jnp.float32),
            c.astype(jnp.float32), is_causal=True, softcap=25.0,
            window=(96, -1), sinks=sinks,
        ).astype(jnp.float16)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            atol=1e-2, rtol=1e-2,
        )
