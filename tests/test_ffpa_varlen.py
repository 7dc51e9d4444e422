"""Varlen (packed THD) correctness vs per-segment dense oracle.

The reference snapshot *lacks* a committed varlen test file (its
tests/test_ffpa_cute.py:10 docstring references one that is absent —
SURVEY.md §4); this file supplies that missing coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy interpret-mode sweeps: slow tier (fast tier: pytest -m 'not slow').
pytestmark = pytest.mark.slow

from ffpa_attn_tpu import ffpa_attn_varlen_func
from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

TOL = 5e-2  # bf16


def _pack(seqs_q, seqs_k, hq, hkv, d, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    tq, tk = sum(seqs_q), sum(seqs_k)
    q = jax.random.normal(kq, (tq, hq, d), dtype=dtype)
    k = jax.random.normal(kk, (tk, hkv, d), dtype=dtype)
    v = jax.random.normal(kv, (tk, hkv, d), dtype=dtype)
    cu_q = jnp.asarray(np.cumsum([0] + list(seqs_q)), jnp.int32)
    cu_k = jnp.asarray(np.cumsum([0] + list(seqs_k)), jnp.int32)
    return q, k, v, cu_q, cu_k


def _oracle_varlen(q, k, v, seqs_q, seqs_k, causal, scale, hq):
    """Per-segment dense reference."""
    outs = []
    lses = []
    oq = ok = 0
    for lq, lk in zip(seqs_q, seqs_k):
        qs = q[oq : oq + lq].swapaxes(0, 1)[None]  # [1, H, lq, D]
        ks = k[ok : ok + lk].swapaxes(0, 1)[None]
        vs = v[ok : ok + lk].swapaxes(0, 1)[None]
        o, lse = reference_attention(
            qs,
            expand_kv_heads(ks, hq),
            expand_kv_heads(vs, hq),
            None,
            is_causal=causal,
            scale=scale,
            return_lse=True,
        )
        outs.append(o[0].swapaxes(0, 1))  # [lq, H, D]
        lses.append(lse[0])  # [H, lq]
        oq += lq
        ok += lk
    return jnp.concatenate(outs, axis=0), jnp.concatenate(lses, axis=1)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "seqs",
    [
        ([200, 312, 64], [200, 312, 64]),  # self varlen
        ([100, 60], [300, 260]),  # cross varlen (Nk >= Nq, tail-aligned)
    ],
)
def test_varlen_fwd(causal, seqs):
    dtype = jnp.bfloat16
    hq = hkv = 2
    d = 320
    seqs_q, seqs_k = seqs
    q, k, v, cu_q, cu_k = _pack(seqs_q, seqs_k, hq, hkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    out, lse = ffpa_attn_varlen_func(
        q,
        k,
        v,
        cu_q,
        cu_k,
        max(seqs_q),
        max(seqs_k),
        causal=causal,
        return_lse=True,
    )
    ref, ref_lse = _oracle_varlen(q, k, v, seqs_q, seqs_k, causal, scale, hq)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=TOL, rtol=TOL,
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=1e-2, rtol=1e-2
    )


def test_varlen_gqa_fwd():
    dtype = jnp.bfloat16
    hq, hkv, d = 4, 2, 320
    seqs = [128, 250]
    q, k, v, cu_q, cu_k = _pack(seqs, seqs, hq, hkv, d, dtype)
    out = ffpa_attn_varlen_func(
        q, k, v, cu_q, None, max(seqs), max(seqs), enable_gqa=True
    )
    ref, _ = _oracle_varlen(q, k, v, seqs, seqs, False, 1.0 / np.sqrt(d), hq)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=TOL, rtol=TOL,
    )


def test_varlen_bwd():
    dtype = jnp.bfloat16
    hq = hkv = 2
    d = 320
    seqs = [200, 184]
    q, k, v, cu_q, cu_k = _pack(seqs, seqs, hq, hkv, d, dtype)
    scale = 1.0 / np.sqrt(d)
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, dtype=dtype)

    def ffpa(q_, k_, v_):
        return ffpa_attn_varlen_func(
            q_, k_, v_, cu_q, cu_k, max(seqs), max(seqs), causal=True
        )

    def oracle(q_, k_, v_):
        o, _ = _oracle_varlen(q_, k_, v_, seqs, seqs, True, scale, hq)
        return o

    out, vjp = jax.vjp(ffpa, q, k, v)
    got = vjp(do)
    _, vjp_ref = jax.vjp(oracle, q, k, v)
    want = vjp_ref(do)
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(g, np.float32),
            np.asarray(w, np.float32),
            atol=TOL,
            rtol=TOL,
            err_msg=name,
        )


def test_varlen_rejected_kwargs():
    # softcap / window_size / alibi_slopes / sinks came OFF the rejection
    # list in round 3 (implemented natively — tests/test_features.py); the
    # consolidated NotImplementedError still covers the rest.
    dtype = jnp.bfloat16
    q, k, v, cu_q, cu_k = _pack([128], [128], 2, 2, 320, dtype)
    with pytest.raises(NotImplementedError) as exc:
        ffpa_attn_varlen_func(
            q, k, v, cu_q, cu_k, 128, 128,
            score_mod=object(), seqused_k=jnp.zeros((1,), jnp.int32),
        )
    assert "score_mod" in str(exc.value) and "seqused_k" in str(exc.value)
    with pytest.raises(NotImplementedError):
        ffpa_attn_varlen_func(q, k, v, cu_q, cu_k, 128, 128, dropout_p=0.1)
    with pytest.raises(TypeError):
        # (int64 would be silently demoted with x64 disabled; float32 is a
        # representable wrong dtype)
        ffpa_attn_varlen_func(
            q, k, v, cu_q.astype(jnp.float32), cu_k, 128, 128
        )


def test_tile_schedule_conservative():
    """The tile scheduler may only skip PROVABLY masked tiles: every
    (q, k) pair with matching segments (and causal-visible rank) must land
    in a needed tile inside the [jmin, jmax] interval."""
    import numpy as np

    from ffpa_attn_tpu.ops.varlen import (
        _interval_schedule,
        _segment_metadata,
        _tile_needed,
    )

    cu = jnp.array([0, 70, 300, 301, 512], jnp.int32)
    tq = tk = 512
    bq = bkv = 128
    q_seg, q_rank, k_seg, k_pos = _segment_metadata(cu, cu, tq, tk, 512, 512)
    for causal in (False, True):
        needed = np.asarray(
            _tile_needed(q_seg, q_rank, k_seg, k_pos, bq, bkv, causal)
        )
        jmin, jmax = map(np.asarray, _interval_schedule(jnp.asarray(needed)))
        qs, qr = np.asarray(q_seg), np.asarray(q_rank)
        ks, kp = np.asarray(k_seg), np.asarray(k_pos)
        vis = (qs[:, None] == ks[None, :]) & (
            (kp[None, :] <= qr[:, None]) if causal else True
        )
        for a in range(tq):
            for b in range(tk):
                if vis[a, b]:
                    i, j = a // bq, b // bkv
                    assert needed[i, j], (a, b, causal)
                    assert jmin[i] <= j <= jmax[i], (a, b, causal)
