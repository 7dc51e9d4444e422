"""Forward correctness vs the fp32 reference oracle.

Mirrors the reference two-tier shape strategy (reference:
tests/test_ffpa_fwd.py:30-45): CORRECTNESS_SHAPES cover representative
small-D/large-D paths; DISPATCH_SHAPES are a wider smoke cross-product.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy interpret-mode sweeps: slow tier (fast tier: pytest -m 'not slow').
pytestmark = pytest.mark.slow

from ffpa_attn_tpu import ffpa_attn_func
from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward
from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

# (B, Hq, Hkv, Nq, Nkv, D)
CORRECTNESS_SHAPES = [
    (1, 2, 2, 256, 256, 320),
    (1, 2, 2, 384, 384, 512),
    (2, 2, 1, 256, 256, 640),  # GQA
    (1, 2, 2, 128, 384, 512),  # cross-attn
    (1, 2, 2, 250, 250, 320),  # non-aligned N
]

TOL = {jnp.float16: 1e-2, jnp.bfloat16: 5e-2}


def _make_qkv(b, hq, hkv, nq, nkv, d, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, nq, d), dtype=dtype)
    k = jax.random.normal(kk, (b, hkv, nkv, d), dtype=dtype)
    v = jax.random.normal(kv, (b, hkv, nkv, d), dtype=dtype)
    return q, k, v


def _check(out, ref, dtype):
    tol = TOL[dtype]
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        atol=tol,
        rtol=tol,
    )


@pytest.mark.parametrize("shape", CORRECTNESS_SHAPES)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
def test_fwd_kernel_vs_reference(shape, causal, dtype):
    """bf16 exercises the kernel directly (incl. the LSE contract); fp16
    goes through the public entry — the production path casts f16 -> bf16
    compute -> f16 out inside the custom_vjp (ops/attention.py
    _to_compute_dtype) and must still hold the reference's fp16 1e-2
    forward tolerance (reference tests/test_ffpa_fwd.py:46-49)."""
    b, hq, hkv, nq, nkv, d = shape
    q, k, v = _make_qkv(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    ref, ref_lse = reference_attention(
        q,
        expand_kv_heads(k, hq),
        expand_kv_heads(v, hq),
        None,
        is_causal=causal,
        scale=scale,
        return_lse=True,
    )
    if dtype == jnp.float16:
        o = ffpa_attn_func(q, k, v, is_causal=causal, enable_gqa=hq != hkv)
        assert o.dtype == jnp.float16
        _check(o, ref, dtype)
        return
    o, lse = flash_attention_forward(
        q, k, v, None, scale=scale, is_causal=causal
    )
    _check(o, ref, dtype)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=5e-3, rtol=5e-3
    )


@pytest.mark.parametrize("mask_kind", ["bool", "float", "key_only"])
def test_fwd_attn_mask(mask_kind):
    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = 1, 2, 2, 256, 256, 320
    q, k, v = _make_qkv(b, hq, hkv, nq, nkv, d, dtype)
    key = jax.random.PRNGKey(7)
    if mask_kind == "bool":
        mask = jax.random.bernoulli(key, 0.9, (b, hq, nq, nkv))
    elif mask_kind == "float":
        mask = jax.random.normal(key, (b, hq, nq, nkv), dtype=jnp.float32)
    else:
        mask = jax.random.normal(key, (1, 1, 1, nkv), dtype=jnp.float32)
    out = ffpa_attn_func(q, k, v, attn_mask=mask)
    from ffpa_attn_tpu.functional import normalize_attn_mask

    bias = normalize_attn_mask(mask, b, hq, nq, nkv)
    ref = reference_attention(q, k, v, bias, scale=1.0 / np.sqrt(d))
    _check(out, ref, dtype)


def test_fwd_dropout_matches_reference_hash():
    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = 1, 2, 2, 256, 256, 320
    q, k, v = _make_qkv(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    o, _ = flash_attention_forward(
        q, k, v, None, scale=scale, is_causal=False, dropout_p=0.3,
        dropout_seed=123,
    )
    ref = reference_attention(
        q, k, v, None, scale=scale, dropout_p=0.3, dropout_seed=123
    )
    _check(o, ref, dtype)


def test_public_api_fallback_small_d():
    dtype = jnp.bfloat16
    q, k, v = _make_qkv(1, 2, 2, 128, 128, 64, dtype)
    out = ffpa_attn_func(q, k, v)
    ref = reference_attention(q, k, v, None, scale=1.0 / np.sqrt(64))
    _check(out, ref, dtype)


def test_public_api_gqa():
    dtype = jnp.bfloat16
    q, k, v = _make_qkv(1, 4, 2, 256, 256, 320, dtype)
    out = ffpa_attn_func(q, k, v, enable_gqa=True, is_causal=True)
    ref = reference_attention(
        q,
        expand_kv_heads(k, 4),
        expand_kv_heads(v, 4),
        None,
        is_causal=True,
        scale=1.0 / np.sqrt(320),
    )
    _check(out, ref, dtype)


def test_decode_nq1():
    dtype = jnp.bfloat16
    q, k, v = _make_qkv(1, 4, 4, 1, 1024, 512, dtype)
    out = ffpa_attn_func(q, k, v)
    ref = reference_attention(q, k, v, None, scale=1.0 / np.sqrt(512))
    _check(out, ref, dtype)


def test_error_taxonomy():
    dtype = jnp.bfloat16
    q, k, v = _make_qkv(1, 2, 2, 256, 256, 320, dtype)
    with pytest.raises(TypeError):
        ffpa_attn_func(q, k, v, bogus_kwarg=1)
    with pytest.raises(ValueError):
        ffpa_attn_func(q, k, v, dropout_p=1.5)
    with pytest.raises(TypeError):
        ffpa_attn_func(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    # causal requires Nkv >= Nq
    q2, k2, v2 = _make_qkv(1, 2, 2, 256, 128, 320, dtype)
    with pytest.raises(ValueError):
        ffpa_attn_func(q2, k2, v2, is_causal=True)
    # GQA without enable_gqa
    q3, k3, v3 = _make_qkv(1, 4, 2, 256, 256, 320, dtype)
    with pytest.raises(ValueError):
        ffpa_attn_func(q3, k3, v3)


def test_autotune_backend_api(monkeypatch):
    """PallasBackend(autotune=True) runs the timed search eagerly and the
    result matches the oracle; under jit it falls back with a warning."""
    import jax
    import numpy as np

    from ffpa_attn_tpu import PallasBackend

    monkeypatch.setenv("FFPA_TPU_AUTOTUNE_MAX_CONFIGS", "2")
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 256, 320), jnp.bfloat16)
    ref = reference_attention(q, q, q, None, scale=320**-0.5)

    o = ffpa_attn_func(q, q, q, backend=PallasBackend(autotune=True))
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )
    o2 = jax.jit(
        lambda q_: ffpa_attn_func(q_, q_, q_, backend=PallasBackend(autotune=True))
    )(q)
    np.testing.assert_allclose(
        np.asarray(o2, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


@pytest.mark.parametrize("nq", [1, 4, 8])
@pytest.mark.parametrize("causal", [False, True])
def test_decode_speculative_shapes(nq, causal):
    """Nq<=8 routes through the decode fast path (incl. speculative
    decoding drafts) with tail-aligned causal semantics."""
    ks = jax.random.split(jax.random.PRNGKey(nq), 3)
    q = jax.random.normal(ks[0], (1, 4, nq, 512), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 4, 1024, 512), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 4, 1024, 512), jnp.bfloat16)
    o = ffpa_attn_func(q, k, v, is_causal=causal)
    r = reference_attention(q, k, v, None, is_causal=causal, scale=512**-0.5)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(r, np.float32),
        atol=5e-2, rtol=5e-2,
    )


@pytest.mark.parametrize("nq", [1, 4])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("group", [4, 8])
def test_decode_gqa_packed(nq, causal, group):
    """PackGQA decode: the whole head group rides one Q row tile, K/V
    stream once per KV head (ops/decode.py; reference pack_gqa.py:15-26)."""
    hq, hkv = 2 * group, 2
    ks = jax.random.split(jax.random.PRNGKey(nq + group), 3)
    q = jax.random.normal(ks[0], (1, hq, nq, 512), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, hkv, 640, 512), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, hkv, 640, 512), jnp.bfloat16)
    o = ffpa_attn_func(q, k, v, is_causal=causal, enable_gqa=True)
    r = reference_attention(
        q, expand_kv_heads(k, hq), expand_kv_heads(v, hq), None,
        is_causal=causal, scale=512**-0.5,
    )
    _check(o, r, jnp.bfloat16)


def test_decode_gqa_packed_bias():
    """Head-varying bias is packed alongside Q in the decode kernel."""
    hq, hkv, nkv = 8, 2, 640
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (1, hq, 1, 512), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, hkv, nkv, 512), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, hkv, nkv, 512), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (1, hq, 1, nkv), jnp.float32)
    o = ffpa_attn_func(q, k, v, attn_mask=bias, enable_gqa=True)
    r = reference_attention(
        q, expand_kv_heads(k, hq), expand_kv_heads(v, hq), bias,
        scale=512**-0.5,
    )
    _check(o, r, jnp.bfloat16)


@pytest.mark.parametrize(
    "shape,causal",
    [((1, 2, 256, 256, 320), False), ((1, 2, 256, 384, 512), True)],
)
def test_fwd_float16_contract(shape, causal):
    """fp16 parity within 1e-2 vs the fp32-accumulated oracle
    (BASELINE.md numerics contract; reference tests/test_ffpa_bwd.py:43-46).
    Computed via bf16 with fp32 accumulation (Mosaic has no f16)."""
    b, h, nq, nkv, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, nq, d), jnp.float16)
    k = jax.random.normal(ks[1], (b, h, nkv, d), jnp.float16)
    v = jax.random.normal(ks[2], (b, h, nkv, d), jnp.float16)
    o = ffpa_attn_func(q, k, v, is_causal=causal)
    assert o.dtype == jnp.float16
    r = reference_attention(q, k, v, None, is_causal=causal, scale=d**-0.5)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(r, np.float32),
        atol=1e-2, rtol=1e-2,
    )


@pytest.mark.parametrize("d", [320, 384, 448, 512, 640, 768, 896, 1024])
def test_dispatch_shapes_smoke(d):
    """DISPATCH smoke: the full large-D set must launch and produce finite
    output at a small N (the reference's DISPATCH_SHAPES HxD cross-product,
    tests/test_ffpa_fwd.py:42-45 — correctness is covered by the
    representative CORRECTNESS shapes above; this guards the config ladder
    and VMEM model across every supported head dim)."""
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (1, 2, 512, d), jnp.bfloat16)
        for i in range(3)
    )
    out = ffpa_attn_func(q, k, v, is_causal=True)
    assert out.shape == q.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all()), d


@pytest.mark.parametrize("d", [320, 448, 512, 640, 768, 896, 1024])
def test_dispatch_features_smoke(d):
    """Feature dispatch smoke: softcap + sliding window + ALiBi + sinks
    must launch and stay finite at every supported head dim (the config
    ladder / VMEM model sees slightly different block shapes per D; the
    feature masks and SMEM operands must survive all of them)."""
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (1, 2, 512, d), jnp.bfloat16)
        for i in range(3)
    )
    out = ffpa_attn_func(
        q, k, v, is_causal=True,
        softcap=30.0,
        window_size=(128, -1),
        alibi_slopes=jnp.asarray([0.02, 0.07], jnp.float32),
        sinks=jnp.asarray([0.3, -0.1], jnp.float32),
    )
    assert out.shape == q.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all()), d
