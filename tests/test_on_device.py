"""On-TPU test lane: compile REAL Mosaic kernels and check numerics.

Run with:

    FFPA_TPU_RUN_DEVICE_TESTS=1 PYTHONPATH=.:/root/.axon_site \
        python -m pytest tests/test_on_device.py -x -q

The CPU suite exercises every code path in interpret mode; this lane is
the Mosaic-lowering + real-chip-numerics gate the reference gets for free
by running its tests on GPUs (SURVEY.md §4). Shapes are kept moderate so
the whole lane compiles in a few minutes over the remote tunnel.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("FFPA_TPU_RUN_DEVICE_TESTS") != "1",
    reason="device lane disabled (set FFPA_TPU_RUN_DEVICE_TESTS=1 on a TPU host)",
)

import jax
import jax.numpy as jnp
import numpy as np


@pytest.fixture(scope="module")
def tpu():
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        pytest.skip(f"no TPU attached (platform={dev.platform})")
    return dev


def _make(b, hq, hkv, nq, nkv, d, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (
        jax.random.normal(ks[0], (b, hq, nq, d), dtype),
        jax.random.normal(ks[1], (b, hkv, nkv, d), dtype),
        jax.random.normal(ks[2], (b, hkv, nkv, d), dtype),
        jax.random.normal(ks[3], (b, hq, nq, d), dtype),
    )


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)


@pytest.mark.parametrize(
    "shape,causal,gqa",
    [
        ((1, 4, 4, 2048, 2048, 512), False, False),
        ((1, 4, 4, 2048, 2048, 512), True, False),
        ((1, 8, 2, 2048, 2048, 320), False, True),
        ((1, 4, 4, 512, 2048, 1024), False, False),  # cross, D=1024
    ],
)
def test_on_device_fwd(tpu, shape, causal, gqa):
    from ffpa_attn_tpu import ffpa_attn_func
    from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

    b, hq, hkv, nq, nkv, d = shape
    q, k, v, _ = _make(b, hq, hkv, nq, nkv, d)
    out = jax.jit(
        lambda q_, k_, v_: ffpa_attn_func(
            q_, k_, v_, is_causal=causal, enable_gqa=gqa
        )
    )(q, k, v)
    ref = reference_attention(
        q, expand_kv_heads(k, hq), expand_kv_heads(v, hq), None,
        is_causal=causal, scale=d**-0.5,
    )
    assert _rel(out, ref) < 5e-2


@pytest.mark.parametrize("save_scores", [True, False])
@pytest.mark.parametrize("causal", [False, True])
def test_on_device_bwd(tpu, causal, save_scores):
    from ffpa_attn_tpu import ffpa_attn_func
    from ffpa_attn_tpu.functional import PallasBackend
    from ffpa_attn_tpu.ops.reference import reference_attention

    q, k, v, do = _make(1, 4, 4, 2048, 2048, 512)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(
            q_, k_, v_, is_causal=causal,
            backward_backend=PallasBackend(save_scores=save_scores),
        )

    def oracle(q_, k_, v_):
        return reference_attention(
            q_, k_, v_, None, is_causal=causal, scale=512**-0.5
        )

    @jax.jit
    def grads(f_q, f_k, f_v):
        out, vjp = jax.vjp(ffpa, f_q, f_k, f_v)
        return vjp(do)

    out_r, vjp_r = jax.vjp(oracle, q, k, v)
    want = vjp_r(do.astype(out_r.dtype))
    got = grads(q, k, v)
    for name, g, w in zip(("dq", "dk", "dv"), got, want):
        assert _rel(g, w) < 5e-2, (name, _rel(g, w))


def test_on_device_decode_gqa(tpu):
    from ffpa_attn_tpu import ffpa_attn_func
    from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

    q, k, v, _ = _make(1, 16, 4, 1, 4096, 512)
    q = q[:, :, :1]
    out = jax.jit(
        lambda q_, k_, v_: ffpa_attn_func(q_, k_, v_, enable_gqa=True)
    )(q, k, v)
    ref = reference_attention(
        q, expand_kv_heads(k, 16), expand_kv_heads(v, 16), None,
        scale=512**-0.5,
    )
    assert _rel(out, ref) < 5e-2


def test_on_device_varlen(tpu):
    from ffpa_attn_tpu import ffpa_attn_varlen_func
    from ffpa_attn_tpu.ops.reference import reference_attention

    t, h, d = 1024, 4, 512
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (t, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (t, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (t, h, d), jnp.bfloat16)
    cu = jnp.asarray([0, 300, 700, 1024], jnp.int32)
    out = ffpa_attn_varlen_func(q, k, v, cu, cu, 512, 512, causal=True)
    for s in range(3):
        lo, hi = int(cu[s]), int(cu[s + 1])
        # THD layout: slice the TOKEN axis (dim 1 after [None]), then move
        # heads ahead of tokens to the reference's [B, H, N, D] layout.
        ref = reference_attention(
            q[None, lo:hi].transpose(0, 2, 1, 3),
            k[None, lo:hi].transpose(0, 2, 1, 3),
            v[None, lo:hi].transpose(0, 2, 1, 3),
            None, is_causal=True, scale=d**-0.5,
        )
        got = out[None, lo:hi].transpose(0, 2, 1, 3)
        assert _rel(got, ref) < 5e-2, s


def test_on_device_fp16(tpu):
    from ffpa_attn_tpu import ffpa_attn_func
    from ffpa_attn_tpu.ops.reference import reference_attention

    q, k, v, do = _make(1, 4, 4, 1024, 1024, 512, dtype=jnp.float16)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, is_causal=True)

    def oracle(q_, k_, v_):
        return reference_attention(q_, k_, v_, None, is_causal=True, scale=512**-0.5)

    out, vjp = jax.vjp(jax.jit(ffpa), q, k, v)
    ref, vjp_r = jax.vjp(oracle, q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2,
    )
    got = vjp(do)
    want = vjp_r(do.astype(ref.dtype))
    for name, g, w in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=1e-2, rtol=1e-2, err_msg=name,
        )


def test_fp8_ds_handoff_on_device(tpu, monkeypatch):
    """Mosaic gate for the opt-in fp8 dS path: the dkdv kernel must store a
    float8_e4m3fn output block and the dq einsum/banded kernel must consume
    it on real hardware (interpret mode cannot prove Mosaic supports the
    fp8 store/cast on this chip generation). dk/dv stay bit-identical to
    the bf16-dS run; dq carries only quantization noise."""
    from dataclasses import replace

    monkeypatch.setenv("FFPA_TPU_ALLOW_FP8_DS", "1")
    from ffpa_attn_tpu.ops.config import BlockConfig
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    q, k, v, do = _make(1, 2, 2, 1024, 2048, 512)
    scale = 512**-0.5
    o, lse = flash_attention_forward(q, k, v, None, scale=scale, is_causal=False)

    def run(bits):
        cfg = replace(BlockConfig(), ds_store_bits=bits)
        f = jax.jit(
            lambda q_, k_, v_, o_, lse_, do_: flash_attention_backward(
                q_, k_, v_, None, o_, lse_, do_, scale=scale,
                is_causal=False, ds_handoff=True, config=cfg,
            )[:3]
        )
        return jax.block_until_ready(f(q, k, v, o, lse, do))

    r16 = run(16)
    r8 = run(8)
    for name, a, b in zip(("dk", "dv"), r16[1:], r8[1:]):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=name,
        )
    assert _rel(r8[0], r16[0]) < 8e-2, "dq fp8 noise beyond rail"
    assert _rel(r8[0], r16[0]) > 0, "fp8 run suspiciously identical"


@pytest.mark.parametrize(
    "quantized,page", [(False, 128), (True, 128), (True, 256)]
)
def test_paged_decode_on_device(tpu, quantized, page):
    """Mosaic gate for the paged decode kernel: the page walk is a
    scalar-prefetch table lookup in the K/V BlockSpec index maps — the
    1-D-flattened pattern documented as stable on v5e (docs/env.md); this
    proves it on real hardware against the dense decode path. The int8
    variant additionally gates the in-kernel i8->bf16 dequant fold, at
    BOTH page sizes (page=256 crashed the round-4 sublane-axis scales
    layout)."""
    import dataclasses

    from ffpa_attn_tpu import (
        PagedKVCache, append_token, ffpa_attn_func, paged_decode_attention,
    )

    b, hkv, hq, d = 2, 2, 8, 512
    lens = [300, 129]
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    full_k = jax.random.normal(ks[0], (b, hkv, max(lens), d), jnp.bfloat16)
    full_v = jax.random.normal(ks[1], (b, hkv, max(lens), d), jnp.bfloat16)
    q = jax.random.normal(ks[2], (b, hq, 1, d), jnp.bfloat16)

    cache = PagedKVCache.alloc(
        b, 512, hkv, d, page_size=page, quantized=quantized
    )
    # Bulk-fill pages via one jit (per-token python appends would compile
    # max(lens) programs over the tunnel).
    c = jax.jit(
        lambda cache, ks_, vs_: jax.lax.scan(
            lambda cc, kv: (append_token(cc, kv[0], kv[1]), 0),
            cache,
            (ks_, vs_),
        )[0]
    )(cache, full_k.transpose(2, 0, 1, 3)[:, :, :, None, :],
      full_v.transpose(2, 0, 1, 3)[:, :, :, None, :])
    c = dataclasses.replace(c, lens=jnp.asarray(lens, jnp.int32))

    out = jax.jit(paged_decode_attention)(q, c)
    for i, n in enumerate(lens):
        want = ffpa_attn_func(
            q[i : i + 1], full_k[i : i + 1, :, :n], full_v[i : i + 1, :, :n],
            enable_gqa=True,
        )
        assert _rel(out[i : i + 1], want) < 5e-2, f"seq {i} len {n}"
