"""Monkey-patch integration (reference: tests/test_monkey_patch.py):
large-D dispatches through FFPA; fallback shapes still work (no recursion)."""

import jax
import jax.numpy as jnp
import numpy as np

import ffpa_attn_tpu
from ffpa_attn_tpu.ops.reference import reference_attention


def _make(b, n, h, d, dtype=jnp.bfloat16, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    # jax.nn layout: [B, N, H, D]
    return (
        jax.random.normal(ks[0], (b, n, h, d), dtype=dtype),
        jax.random.normal(ks[1], (b, n, h, d), dtype=dtype),
        jax.random.normal(ks[2], (b, n, h, d), dtype=dtype),
    )


def test_patch_large_d_and_fallback():
    q, k, v = _make(1, 256, 2, 320)
    qs, ks_, vs = _make(1, 128, 2, 64, seed=1)
    try:
        ffpa_attn_tpu.patch_dot_product_attention()
        out = jax.nn.dot_product_attention(q, k, v, is_causal=True)
        ref = reference_attention(
            jnp.swapaxes(q, 1, 2),
            jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2),
            None,
            is_causal=True,
            scale=1 / np.sqrt(320),
        )
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(out, 1, 2), np.float32),
            np.asarray(ref, np.float32),
            atol=5e-2,
            rtol=5e-2,
        )
        # small-D falls back without recursion
        out_small = jax.nn.dot_product_attention(qs, ks_, vs)
        assert out_small.shape == qs.shape
        assert bool(jnp.all(jnp.isfinite(out_small.astype(jnp.float32))))
    finally:
        ffpa_attn_tpu.unpatch_dot_product_attention()
    # unpatched again
    assert jax.nn.dot_product_attention.__name__ == "dot_product_attention"


def test_patch_unsupported_kwargs_route_to_original():
    """Kwargs FFPA does not implement (e.g. query_seq_lengths) must reach
    the ORIGINAL jax.nn.dot_product_attention — never be silently dropped
    (interface.py:_dpa_compatible_ffpa). local_window_size used to be on
    this list; it now maps onto the native window path and is covered by
    tests/test_features.py::test_dpa_patch_local_window_size."""
    q, k, v = _make(1, 256, 2, 320)
    seqlens = jnp.asarray([200], jnp.int32)
    try:
        ffpa_attn_tpu.patch_dot_product_attention()
        out = jax.nn.dot_product_attention(
            q, k, v, is_causal=True, query_seq_lengths=seqlens,
            key_value_seq_lengths=seqlens,
        )
        # Stock XLA semantics — compare against the unpatched function
        # directly.
        ffpa_attn_tpu.unpatch_dot_product_attention()
        ref = jax.nn.dot_product_attention(
            q, k, v, is_causal=True, query_seq_lengths=seqlens,
            key_value_seq_lengths=seqlens,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=1e-6, rtol=0,
        )
    finally:
        ffpa_attn_tpu.unpatch_dot_product_attention()
