"""Transform-composition tests: jit / grad-of-jit / vmap / scan.

The analog of reference tests/test_ffpa_compile.py (torch.compile
integration): on JAX, "compile support" means the op composes with every
transform, which custom_vjp guarantees by construction — these tests lock
that in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffpa_attn_tpu import ffpa_attn_func
from ffpa_attn_tpu.ops.reference import reference_attention

TOL = 5e-2


def _make(b, h, n, d, dtype=jnp.bfloat16, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    return (
        jax.random.normal(ks[0], (b, h, n, d), dtype=dtype),
        jax.random.normal(ks[1], (b, h, n, d), dtype=dtype),
        jax.random.normal(ks[2], (b, h, n, d), dtype=dtype),
    )


def _close(a, b):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=TOL, rtol=TOL
    )


def test_jit_matches_eager():
    q, k, v = _make(1, 2, 256, 320)
    eager = ffpa_attn_func(q, k, v, is_causal=True)
    jitted = jax.jit(lambda a, b, c: ffpa_attn_func(a, b, c, is_causal=True))(
        q, k, v
    )
    _close(eager, jitted)


def test_grad_of_jit():
    q, k, v = _make(1, 2, 256, 320)

    def loss(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_).astype(jnp.float32).sum()

    g1 = jax.grad(loss)(q, k, v)
    g2 = jax.jit(jax.grad(loss))(q, k, v)
    _close(g1, g2)


def test_value_and_grad_under_jit_matches_oracle():
    q, k, v = _make(1, 2, 256, 320)
    do = jnp.ones_like(q, dtype=jnp.float32)

    @jax.jit
    def ffpa_loss_grad(q_, k_, v_):
        def loss(q__):
            return (
                ffpa_attn_func(q__, k_, v_).astype(jnp.float32) * do
            ).sum()

        return jax.value_and_grad(loss)(q_)

    def oracle_loss(q_):
        return (
            reference_attention(q_, k, v, None, scale=1 / np.sqrt(320)).astype(
                jnp.float32
            )
            * do
        ).sum()

    val, grad = ffpa_loss_grad(q, k, v)
    val_ref, grad_ref = jax.value_and_grad(oracle_loss)(q)
    assert abs(float(val) - float(val_ref)) / abs(float(val_ref)) < 1e-2
    _close(grad, grad_ref)


def test_vmap_over_batch():
    """vmap over an extra leading axis composes with the custom_vjp op."""
    q, k, v = _make(2, 2, 256, 320)
    # vmap the B axis manually.
    out_vmap = jax.vmap(
        lambda q_, k_, v_: ffpa_attn_func(q_[None], k_[None], v_[None])[0]
    )(q, k, v)
    out = ffpa_attn_func(q, k, v)
    _close(out_vmap, out)


def test_scan_over_layers():
    """lax.scan with the op inside (training-loop shape stability)."""
    q, k, v = _make(1, 2, 256, 320)

    def body(carry, _):
        out = ffpa_attn_func(carry, k, v)
        return out, ()

    final, _ = jax.lax.scan(body, q, None, length=2)
    expected = ffpa_attn_func(ffpa_attn_func(q, k, v), k, v)
    _close(final, expected)
