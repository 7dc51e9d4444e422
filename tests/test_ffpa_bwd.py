"""Backward correctness: dQ/dK/dV/dBias vs the fp32 oracle's autodiff.

Mirrors reference tests/test_ffpa_bwd.py coverage: causal/non-causal,
GQA/MQA, cross-attn, bias grads, dropout replay. Tolerances: fp16 1e-2,
bf16 5e-2 (reference tests/test_ffpa_bwd.py:38-46).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy interpret-mode sweeps: slow tier (fast tier: pytest -m 'not slow').
pytestmark = pytest.mark.slow

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


@pytest.mark.parametrize("group", [1, 4])
def test_bwd_decode_nq1(group):
    """Nq=1 grads: the decode fast path's custom_vjp routes to the fused
    fp32 composite (ops/decode.py:_decode_core_bwd) — at Nq<=8 the tiled
    backward pads Q to a full block and loses 2.6x to the composite on
    chip — so gradients must be EXACTLY the oracle's own vjp (group-
    reduced dk/dv for GQA, primal dtypes preserved)."""
    dtype = jnp.bfloat16
    b, hq, nkv, d = 1, 4, 512, 512
    hkv = hq // group
    q, k, v, do = _make(b, hq, hkv, 1, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, enable_gqa=group != 1)

    def oracle(q_, k_, v_):
        return reference_attention(
            q_, expand_kv_heads(k_, hq), expand_kv_heads(v_, hq), None,
            scale=scale,
        )

    dq, dk, dv = _grads(ffpa, (q, k, v), do)
    dq_r, dk_r, dv_r = _grads(oracle, (q, k, v), do)
    assert dq.dtype == q.dtype and dk.dtype == k.dtype and dv.dtype == v.dtype
    assert dk.shape == k.shape and dv.shape == v.shape
    _assert_close(dq, dq_r, dtype, "dq")
    _assert_close(dk, dk_r, dtype, "dk")
    _assert_close(dv, dv_r, dtype, "dv")


def test_bwd_decode_nq1_sinks_window():
    """Decode grads through the composite vjp with the extension kwargs
    live: learnable sinks must receive their (closed-form) gradient and a
    sliding window must clip dk/dv to the in-window cache suffix."""
    dtype = jnp.bfloat16
    b, hq, nkv, d = 1, 4, 512, 320
    window = 256
    q, k, v, do = _make(b, hq, hq, 1, nkv, d, dtype)
    sinks = jnp.zeros((hq,), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    def ffpa(q_, k_, v_, s_):
        return ffpa_attn_func(
            q_, k_, v_, window_size=(window, -1), sinks=s_
        )

    def oracle(q_, k_, v_, s_):
        return reference_attention(
            q_, k_, v_, None, scale=scale, window=(window, -1), sinks=s_
        )

    def grads(fn):
        def loss(q_, k_, v_, s_):
            return (
                fn(q_, k_, v_, s_).astype(jnp.float32)
                * do.astype(jnp.float32)
            ).sum()

        return jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, sinks)

    got = grads(ffpa)
    want = grads(oracle)
    for g, w, name in zip(got, want, ("dq", "dk", "dv", "dsinks")):
        _assert_close(g, w, dtype, name)
    # Out-of-window cache prefix gets zero gradient: row 0 of the decode
    # query attends keys [nkv - window - 1 + 1, nkv) under the
    # tail-aligned band.
    dk = got[1]
    assert jnp.all(dk[:, :, : nkv - window - 1] == 0)


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


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("group", [1, 2])
def test_bwd_ds_handoff_matches_recompute(causal, group):
    """The dS-handoff scheme (dQ = XLA matmul over the handed-off score
    gradient) matches the recompute dQ kernel to within final-rounding
    ulps: both round dS to bf16 before the MXU matmul, so dk/dv are
    bit-identical, while dq's fp32 accumulation ORDER differs (one XLA
    contraction vs block_kv-wide kernel steps) — a 1-2 bf16-ulp wobble,
    not a numerics change."""
    from ffpa_attn_tpu.ops.config import BlockConfig
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    dtype = jnp.bfloat16
    b, hq, nq, nkv, d = 1, 2 * group, 256, 384, 320
    q, k, v, do = _make(b, hq, hq // group, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    cfg = BlockConfig()
    o, lse = flash_attention_forward(q, k, v, None, scale=scale, is_causal=causal)
    ref = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=causal,
        ds_handoff=False, config=cfg,
    )
    got = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=causal,
        ds_handoff=True, config=cfg,
    )
    for name, r, g in zip(("dq", "dk", "dv"), ref, got):
        tol = dict(rtol=2**-7, atol=1e-4) if name == "dq" else dict(rtol=0, atol=0)
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            err_msg=name, **tol,
        )


def _assert_rel_close(got, ref, name, tol=1e-2):
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    rel = np.max(np.abs(g - r)) / (np.max(np.abs(r)) + 1e-9)
    assert rel < tol, (name, rel)


def test_bwd_ds_handoff_bias_grad():
    """dbias through the handoff (sum of bf16 dS) stays within the numerics
    contract vs the fp32-dS recompute path."""
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    dtype = jnp.bfloat16
    b, hq, nq, nkv, d = 1, 2, 256, 256, 320
    q, k, v, do = _make(b, hq, hq, nq, nkv, d, dtype)
    bias = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 1, nkv), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    o, lse = flash_attention_forward(q, k, v, bias, scale=scale, is_causal=False)
    ref = flash_attention_backward(
        q, k, v, bias, o, lse, do, scale=scale, is_causal=False,
        ds_handoff=False,
    )
    got = flash_attention_backward(
        q, k, v, bias, o, lse, do, scale=scale, is_causal=False,
        ds_handoff=True,
    )
    # bf16 contract is 5e-2 (reference tests/test_ffpa_bwd.py:40-42): the
    # handoff sums bf16-rounded dS for compact-bias reductions.
    np.testing.assert_allclose(
        np.asarray(got[3], np.float32), np.asarray(ref[3], np.float32),
        rtol=5e-2, atol=5e-2, err_msg="dbias",
    )


def test_bwd_ds_handoff_striped(monkeypatch):
    """KV-striped handoff (budget smaller than dS) matches the recompute
    path; dropout replay must use GLOBAL column ids across stripes."""
    import os

    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    monkeypatch.setenv(
        "FFPA_TPU_DS_HANDOFF_LIMIT_BYTES", str(2 * 4 * 384 * 256 * 2)
    )
    dtype = jnp.bfloat16
    b, hq, nq, nkv, d = 1, 2, 256, 768, 320
    q, k, v, do = _make(b, hq, hq, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    o, lse = flash_attention_forward(
        q, k, v, None, scale=scale, is_causal=True, dropout_p=0.1,
        dropout_seed=3,
    )
    ref = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=True,
        dropout_p=0.1, dropout_seed=3, ds_handoff=False,
    )
    got = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=True,
        dropout_p=0.1, dropout_seed=3, ds_handoff=True,
    )
    # Striped dq sums per-stripe fp32 einsums in a different order than the
    # kernel's sequential accumulation — tolerance, not bit-equality.
    for name, r, g in zip(("dq", "dk", "dv"), ref, got):
        _assert_rel_close(g, r, name)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("save_scores", [True, False])
def test_bwd_save_scores_paths(causal, save_scores):
    """Both residual policies (S-resident 4-matmul backward vs the
    flash-style recompute/handoff backward) satisfy the numerics contract
    through the public API (flash_bwd.py:_dkdv_from_s_kernel)."""
    from ffpa_attn_tpu.functional import PallasBackend

    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = 1, 4, 2, 250, 384, 320
    q, k, v, do = _make(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(
            q_, k_, v_, is_causal=causal, enable_gqa=True,
            backward_backend=PallasBackend(save_scores=save_scores),
        )

    def oracle(q_, k_, v_):
        return reference_attention(
            q_, expand_kv_heads(k_, hq), expand_kv_heads(v_, hq), None,
            is_causal=causal, scale=scale,
        )

    dq, dk, dv = _grads(ffpa, (q, k, v), do)
    dq_r, dk_r, dv_r = _grads(oracle, (q, k, v), do)
    _assert_close(dq, dq_r, dtype, "dq")
    _assert_close(dk, dk_r, dtype, "dk")
    _assert_close(dv, dv_r, dtype, "dv")


def test_bwd_save_scores_dropout_bias():
    """S-resident backward replays dropout and reduces dbias from the
    aliased dS buffer (skipped causal tiles must yield zero dS)."""
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    dtype = jnp.bfloat16
    b, hq, nq, nkv, d = 1, 2, 256, 384, 320
    q, k, v, do = _make(b, hq, hq, nq, nkv, d, dtype)
    bias = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 1, nkv), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    o, lse, s = flash_attention_forward(
        q, k, v, bias, scale=scale, is_causal=True, dropout_p=0.1,
        dropout_seed=3, return_scores=True,
    )
    ref = flash_attention_backward(
        q, k, v, bias, o, lse, do, scale=scale, is_causal=True,
        dropout_p=0.1, dropout_seed=3, ds_handoff=False,
    )
    got = flash_attention_backward(
        q, k, v, bias, o, lse, do, scale=scale, is_causal=True,
        dropout_p=0.1, dropout_seed=3, scores=s,
    )
    for name, r, g in zip(("dq", "dk", "dv", "dbias"), ref, got):
        _assert_rel_close(g, r, name, tol=3e-2)


def test_save_scores_auto_gate(monkeypatch):
    """AUTO S-residency budgets headroom for ENV.scores_auto_assumed_layers
    simultaneous residuals (a stacked no-remat model), and explicit
    save_scores=True with float16 primals is ignored with a warning (the
    bf16 S residual would erode the fp16 1e-2 contract)."""
    from ffpa_attn_tpu.ops.attention import StaticArgs, _should_save_scores

    def make_static(**kw):
        base = dict(
            scale=0.1, is_causal=False, dropout_p=0.0, fwd_config=None,
            bwd_config=None, backward_is_sdpa=False,
            grad_kv_storage_dtype=None, grad_q_storage_dtype=None,
        )
        base.update(kw)
        return StaticArgs(**base)

    b, h, n, d = 1, 4, 2048, 512
    q = jnp.zeros((b, h, n, d), jnp.bfloat16)
    k = v = q
    st = make_static()
    # Scores = 4*2048^2*2 = 32 MiB; fits any sane budget -> auto on.
    monkeypatch.setenv("FFPA_TPU_HBM_BYTES", str(16 * 1024**3))
    assert _should_save_scores(st, q, k, v, None)
    # Shrink HBM so ONE residual fits the naive check but `assumed_layers`
    # copies do not: auto must decline.
    residents = 2 * (5 * q.size + 4 * k.size)
    margin = 4 * 1024**3
    scores = b * h * n * n * 2
    monkeypatch.setenv(
        "FFPA_TPU_HBM_BYTES", str(residents + margin + scores + scores // 2)
    )
    monkeypatch.setenv("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "2")
    assert not _should_save_scores(st, q, k, v, None)
    monkeypatch.setenv("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "1")
    assert _should_save_scores(st, q, k, v, None)
    monkeypatch.delenv("FFPA_TPU_HBM_BYTES")
    monkeypatch.delenv("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS")
    # Explicit opt-in still honored for bf16 ...
    assert _should_save_scores(make_static(save_scores=True), q, k, v, None)
    # ... but ignored (False) for fp16 primals.
    qf = jnp.zeros((b, h, n, d), jnp.float16)
    assert not _should_save_scores(
        make_static(save_scores=True), qf, qf, qf, None
    )


@pytest.mark.parametrize("causal", [False, True])
def test_partial_head_residency(monkeypatch, causal):
    """When only part of the S residual fits the HBM budget, auto mode
    saves S for whole head GROUPS and runs the hybrid backward (from-S for
    resident heads + recompute for the rest) — grads must match the
    oracle, and the head count must follow the budget."""
    from ffpa_attn_tpu.ops.attention import StaticArgs, _resident_head_count

    dtype = jnp.bfloat16
    b, hq, hkv, nq, nkv, d = 1, 4, 2, 256, 384, 320
    q, k, v, do = _make(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)

    # Budget for 3 head-residuals (per_head = b*nq_pad*nkv_pad*2; blocks
    # clamp to 256/384 here so pads equal the true sizes): the partial
    # gate reserves budget//4 for the rest-heads' handoff slabs, leaving
    # m = (3 - 0.75) -> 2 resident heads.
    per_head = b * nq * nkv * 2
    residents = 2 * (5 * q.size + 4 * k.size)
    margin = 4 * 1024**3
    monkeypatch.setenv("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", "1")
    monkeypatch.setenv(
        "FFPA_TPU_HBM_BYTES", str(residents + margin + 3 * per_head)
    )
    st = StaticArgs(
        scale=scale, is_causal=causal, dropout_p=0.0, fwd_config=None,
        bwd_config=None, backward_is_sdpa=False,
        grad_kv_storage_dtype=None, grad_q_storage_dtype=None,
    )
    assert _resident_head_count(st, q, k, v, None) == 2

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, is_causal=causal, enable_gqa=True)

    def oracle(q_, k_, v_):
        return reference_attention(
            q_, expand_kv_heads(k_, hq), expand_kv_heads(v_, hq), None,
            is_causal=causal, scale=scale,
        )

    out = ffpa(q, k, v)
    ref = reference_attention(
        q, expand_kv_heads(k, hq), expand_kv_heads(v, hq), None,
        is_causal=causal, scale=scale,
    )
    _assert_close(out, ref, dtype, "out")
    dq, dk, dv = _grads(ffpa, (q, k, v), do)
    dq_r, dk_r, dv_r = _grads(oracle, (q, k, v), do)
    _assert_close(dq, dq_r, dtype, "dq")
    _assert_close(dk, dk_r, dtype, "dk")
    _assert_close(dv, dv_r, dtype, "dv")

    # Broadcast key-bias under partial residency: db = db1 + db2.
    bias = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 1, nkv), jnp.float32)

    def ffpa_b(q_, k_, v_, bias_):
        return ffpa_attn_func(
            q_, k_, v_, attn_mask=bias_, is_causal=causal, enable_gqa=True
        )

    def oracle_b(q_, k_, v_, bias_):
        return reference_attention(
            q_, expand_kv_heads(k_, hq), expand_kv_heads(v_, hq), bias_,
            is_causal=causal, scale=scale,
        )

    *g_b, db = _grads(ffpa_b, (q, k, v, bias), do)
    *g_br, db_r = _grads(oracle_b, (q, k, v, bias), do)
    np.testing.assert_allclose(
        np.asarray(db, np.float32), np.asarray(db_r, np.float32),
        atol=5e-2, rtol=5e-2, err_msg="dbias",
    )

    # Dropout forbids PARTIAL residency (head-shifted hash) -> 0 ...
    st_drop = StaticArgs(
        scale=scale, is_causal=causal, dropout_p=0.1, fwd_config=None,
        bwd_config=None, backward_is_sdpa=False,
        grad_kv_storage_dtype=None, grad_q_storage_dtype=None,
    )
    assert _resident_head_count(st_drop, q, k, v, None) == 0
    # ... but FULL residency with dropout stays allowed.
    monkeypatch.setenv(
        "FFPA_TPU_HBM_BYTES", str(residents + margin + 8 * per_head)
    )
    assert _resident_head_count(st_drop, q, k, v, None) == hq


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("group", [1, 2])
def test_accumulator_split_dk_from_ds(causal, group):
    """Accumulator-split dispatch (dkdv_dk_in_kernel=False): dK produced by
    the dS-slab einsum (banded kernel under causal) must match the
    in-kernel accumulation (config.py; the M4N2 analog at D>=768)."""
    from dataclasses import replace

    from ffpa_attn_tpu.ops.config import BlockConfig
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    dtype = jnp.bfloat16
    b, hq, nq, nkv, d = 1, 2 * group, 256, 384, 640
    hkv = hq // group
    q, k, v, do = _make(b, hq, hkv, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    o, lse, s = flash_attention_forward(
        q, k, v, None, scale=scale, is_causal=causal, return_scores=True,
    )
    base = BlockConfig(block_q_dkdv=128, block_kv_dkdv=128,
                       block_q_dq=128, block_kv_dq=128)
    ref = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=causal,
        scores=s, config=base,
    )
    got = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=causal,
        scores=s, config=replace(base, dkdv_dk_in_kernel=False),
    )
    for name, r, g in zip(("dq", "dk", "dv"), ref, got):
        _assert_rel_close(g, r, name)


def test_fwd_scores_residual_matches_plain():
    """return_scores must not perturb (o, lse), and exp(S - lse) must
    reproduce the probability matrix of the fp32 oracle within bf16
    rounding."""
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    dtype = jnp.bfloat16
    b, h, nq, nkv, d = 1, 2, 250, 300, 320
    q, k, v, _ = _make(b, h, h, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    o, lse = flash_attention_forward(q, k, v, None, scale=scale, is_causal=True)
    o2, lse2, s = flash_attention_forward(
        q, k, v, None, scale=scale, is_causal=True, return_scores=True,
    )
    np.testing.assert_array_equal(np.asarray(o, np.float32), np.asarray(o2, np.float32))
    np.testing.assert_array_equal(np.asarray(lse), np.asarray(lse2))
    p = np.exp(
        np.asarray(s[:, :, :nq, :nkv], np.float32)
        - np.asarray(lse)[:, :, :, None]
    )
    s_ref = np.einsum(
        "bhqd,bhkd->bhqk",
        np.asarray(q, np.float32),
        np.asarray(k, np.float32),
    ) * scale
    rows = np.arange(nq)[:, None]
    cols = np.arange(nkv)[None, :]
    visible = cols <= rows + (nkv - nq)
    s_ref = np.where(visible, s_ref, -np.inf)
    p_ref = np.exp(s_ref - np.log(np.exp(s_ref).sum(-1, keepdims=True)))
    # Above-diagonal S blocks are deliberately never written (clamped out
    # index map elides masked-tile DMA); compare the visible region only.
    np.testing.assert_allclose(
        np.where(visible, p, 0.0), np.where(visible, p_ref, 0.0),
        atol=2e-2, rtol=0,
    )


@pytest.mark.parametrize(
    "shape,causal,gqa",
    [
        ((1, 2, 2, 256, 256, 320), False, False),
        ((1, 2, 2, 256, 384, 512), True, False),
        ((1, 4, 2, 250, 250, 512), False, True),
    ],
)
def test_bwd_float16_contract(shape, causal, gqa):
    """fp16 gradients within 1e-2 of the fp32 oracle (BASELINE.md;
    reference tests/test_ffpa_bwd.py:43-46). The dV matmul uses the hi+lo
    P split (flash_bwd._dv_accumulate) — plain bf16 P rounding leaves a
    small violation tail at this tolerance."""
    b, hq, hkv, nq, nkv, d = shape
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, hq, nq, d), jnp.float16)
    k = jax.random.normal(ks[1], (b, hkv, nkv, d), jnp.float16)
    v = jax.random.normal(ks[2], (b, hkv, nkv, d), jnp.float16)
    do = jax.random.normal(ks[3], (b, hq, nq, d), jnp.float16)
    scale = 1.0 / np.sqrt(d)

    def ffpa(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, is_causal=causal, enable_gqa=gqa)

    def oracle(q_, k_, v_):
        return reference_attention(
            q_, expand_kv_heads(k_, hq), expand_kv_heads(v_, hq), None,
            is_causal=causal, scale=scale,
        )

    dq, dk, dv = _grads(ffpa, (q, k, v), do)
    dq_r, dk_r, dv_r = _grads(oracle, (q, k, v), do)
    assert dq.dtype == jnp.float16
    for name, g, r in (("dq", dq, dq_r), ("dk", dk, dk_r), ("dv", dv, dv_r)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            atol=1e-2, rtol=1e-2, err_msg=name,
        )


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_ds_handoff_fp8_storage(causal, monkeypatch):
    """fp8 (e4m3) dS storage (opt-in, env.py allow_fp8_ds): dk/dv are
    BIT-identical to the bf16-dS run (both consume the full-precision
    in-VMEM dS); dq carries the stored slab's quantization noise — ~3% RMS,
    ~5% at the worst element (the reason the knob is opt-in: that max sits
    AT the public 5e-2 contract). fp16 cotangents silently keep bf16 dS
    (no margin under the 1e-2 contract), as does an unset flag."""
    from dataclasses import replace

    monkeypatch.setenv("FFPA_TPU_ALLOW_FP8_DS", "1")
    from ffpa_attn_tpu.ops.config import BlockConfig
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    dtype = jnp.bfloat16
    b, h, nq, nkv, d = 1, 2, 384, 512, 320
    q, k, v, do = _make(b, h, h, nq, nkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    cfg16 = BlockConfig()
    cfg8 = replace(cfg16, ds_store_bits=8)
    o, lse = flash_attention_forward(q, k, v, None, scale=scale, is_causal=causal)

    r16 = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=causal,
        ds_handoff=True, config=cfg16,
    )
    r8 = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=causal,
        ds_handoff=True, config=cfg8,
    )
    for name, a, bb in zip(("dk", "dv"), r16[1:3], r8[1:3]):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            err_msg=name,
        )
    # dq: quantization noise only — ~3% RMS, bounded worst element.
    g8 = np.asarray(r8[0], np.float32)
    g16 = np.asarray(r16[0], np.float32)
    rms_rel = float(
        np.sqrt(np.mean((g8 - g16) ** 2)) / (np.sqrt(np.mean(g16**2)) + 1e-9)
    )
    assert rms_rel < 4e-2, ("dq fp8 RMS noise", rms_rel)
    _assert_rel_close(r8[0], r16[0], "dq fp8-vs-bf16 worst", tol=8e-2)

    def f32_loss(q_, k_, v_):
        out = reference_attention(
            q_.astype(jnp.float32), k_.astype(jnp.float32),
            v_.astype(jnp.float32), None, is_causal=causal, scale=scale,
        )
        return (out * do.astype(jnp.float32)).sum()

    gq = jax.grad(f32_loss)(q, k, v)
    _assert_rel_close(r8[0], gq, "dq fp8-vs-oracle", tol=8e-2)

    # The production fp16 route (bf16 primals + f16 cotangent): the fp8
    # request must be silently ignored — dq matches the bf16-dS run on the
    # same rounded cotangent bit-for-bit.
    doh = do.astype(jnp.float16)
    rf8 = flash_attention_backward(
        q, k, v, None, o, lse, doh,
        scale=scale, is_causal=causal, ds_handoff=True, config=cfg8,
    )
    rf = flash_attention_backward(
        q, k, v, None, o, lse, doh,
        scale=scale, is_causal=causal, ds_handoff=True, config=cfg16,
    )
    np.testing.assert_array_equal(
        np.asarray(rf8[0], np.float32), np.asarray(rf[0], np.float32),
        err_msg="fp16 cotangent must force bf16 dS",
    )


def test_bwd_candidates_fp8_gating(monkeypatch):
    """fp8 dS variants appear only for big-N bf16 handoff tasks under the
    explicit env opt-in: never by default, never on the from-S path, never
    when the caller marks the task fp16, never at small N (the dS stream
    is not the bottleneck there)."""
    from ffpa_attn_tpu.autotune.search import bwd_candidates

    monkeypatch.delenv("FFPA_TPU_ALLOW_FP8_DS", raising=False)
    default = bwd_candidates(512, 512, 8192, 8192, 2, False, "fast")
    assert all(c.ds_store_bits == 16 for c in default)

    monkeypatch.setenv("FFPA_TPU_ALLOW_FP8_DS", "1")
    big = bwd_candidates(512, 512, 8192, 8192, 2, False, "fast")
    assert any(c.ds_store_bits == 8 for c in big)
    assert any(c.ds_store_bits == 16 for c in big)
    small = bwd_candidates(512, 512, 1024, 1024, 2, False, "fast")
    assert all(c.ds_store_bits == 16 for c in small)
    f16 = bwd_candidates(512, 512, 8192, 8192, 2, False, "fast", allow_fp8_ds=False)
    assert all(c.ds_store_bits == 16 for c in f16)
    froms = bwd_candidates(512, 512, 8192, 8192, 2, False, "fast", from_scores=True)
    assert all(c.ds_store_bits == 16 for c in froms)
    # Biased tasks: dbias sums the stored slab, so fp8 never enters.
    biased = bwd_candidates(512, 512, 8192, 8192, 2, True, "fast")
    assert all(c.ds_store_bits == 16 for c in biased)


def test_bwd_fp8_ds_ignored_without_optin(monkeypatch):
    """With FFPA_TPU_ALLOW_FP8_DS unset, a ds_store_bits=8 config must
    behave exactly like bf16 dS (the contract stays intact by default)."""
    from dataclasses import replace

    monkeypatch.delenv("FFPA_TPU_ALLOW_FP8_DS", raising=False)

    from ffpa_attn_tpu.ops.config import BlockConfig
    from ffpa_attn_tpu.ops.flash_bwd import flash_attention_backward
    from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward

    dtype = jnp.bfloat16
    q, k, v, do = _make(1, 2, 2, 256, 384, 320, dtype)
    scale = 1.0 / np.sqrt(320)
    o, lse = flash_attention_forward(q, k, v, None, scale=scale, is_causal=False)
    r8 = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=False,
        ds_handoff=True, config=replace(BlockConfig(), ds_store_bits=8),
    )
    r16 = flash_attention_backward(
        q, k, v, None, o, lse, do, scale=scale, is_causal=False,
        ds_handoff=True, config=BlockConfig(),
    )
    for name, a, bb in zip(("dq", "dk", "dv"), r8[:3], r16[:3]):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            err_msg=name,
        )


@pytest.mark.parametrize("mode", ["hilo", "psplit", "plain"])
def test_f16_pv_mode_knob(monkeypatch, mode):
    """FFPA_TPU_F16_PV_MODE selects the fp16 dV scheme at trace time.

    hilo (default) and psplit must hold the 1e-2 gradient contract at
    reference-tolerance scale (N=256, reference tests/test_ffpa_bwd.py:38-46);
    plain drops both correction matmuls and rides the contract boundary even
    here (docs/design.md "Round-5 contract table" — tail elements land just
    over 1e-2), so for it this pins only the knob's plumbing (env ->
    flash_bwd dV accumulate: finite grads, right dtypes).
    """
    monkeypatch.setenv("FFPA_TPU_F16_PV_MODE", mode)
    dtype = jnp.float16
    q, k, v, do = _make(1, 2, 2, 256, 256, 512, dtype)
    ref = reference_attention(q, k, v, is_causal=True)
    got, grads = None, None
    out, vjp = jax.vjp(lambda *a: ffpa_attn_func(*a, is_causal=True), q, k, v)
    grads = vjp(do)
    _assert_close(out, ref, dtype, f"out[{mode}]")
    rout, rvjp = jax.vjp(
        lambda *a: reference_attention(*a, is_causal=True), q, k, v
    )
    rgrads = rvjp(do.astype(rout.dtype))
    for name, g, rg in zip(("dq", "dk", "dv"), grads, rgrads):
        assert g.dtype == dtype, name
        assert np.all(np.isfinite(np.asarray(g, np.float32))), name
        if mode == "plain" and name == "dv":
            # boundary mode: bound the excursion instead (≤3x tolerance)
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(rg, np.float32),
                atol=3e-2, rtol=3e-2, err_msg=f"{name}[{mode}]",
            )
        else:
            _assert_close(g, rg, dtype, f"{name}[{mode}]")


def test_f16_pv_mode_invalid(monkeypatch):
    monkeypatch.setenv("FFPA_TPU_F16_PV_MODE", "bogus")
    from ffpa_attn_tpu.env import ENV

    with pytest.raises(ValueError, match="F16_PV_MODE"):
        ENV.f16_pv_mode()
