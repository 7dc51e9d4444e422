"""Subprocess payload: ring attention + TP correctness on an 8-device CPU mesh.

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Exits nonzero on any mismatch.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Drop the TPU plugin path so the CPU backend is used.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention
from ffpa_attn_tpu.parallel import (
    head_parallel_attention,
    make_mesh,
    ring_attention_sharded,
    ulysses_attention_sharded,
)

TOL = 5e-2


def check(name, got, want):
    err = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    )
    ok = err < TOL
    print(f"{name}: max|err|={err:.5f} {'OK' if ok else 'FAIL'}")
    if not ok:
        sys.exit(1)


def main():
    assert len(jax.devices()) >= 8, jax.devices()
    dtype = jnp.bfloat16
    b, h, n, d = 1, 4, 512, 320
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, n, d), dtype=dtype)
    k = jax.random.normal(kk, (b, h, n, d), dtype=dtype)
    v = jax.random.normal(kv, (b, h, n, d), dtype=dtype)
    scale = 1.0 / np.sqrt(d)

    # --- ring attention, non-causal and causal, 4-way sequence shard ---
    mesh = make_mesh((4,), ("sp",))
    for causal in (False, True):
        got = ring_attention_sharded(q, k, v, mesh, seq_axis="sp", causal=causal)
        want = reference_attention(q, k, v, None, is_causal=causal, scale=scale)
        check(f"ring(causal={causal})", got, want)

    # --- ring backward ---
    do = jax.random.normal(kd, q.shape, dtype=dtype)

    def ring_loss(q_, k_, v_):
        o = ring_attention_sharded(q_, k_, v_, mesh, seq_axis="sp", causal=True)
        return (o.astype(jnp.float32) * do.astype(jnp.float32)).sum()

    def ref_loss(q_, k_, v_):
        o = reference_attention(q_, k_, v_, None, is_causal=True, scale=scale)
        return (o.astype(jnp.float32) * do.astype(jnp.float32)).sum()

    g = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, gr, name in zip(g, g_ref, ["dq", "dk", "dv"]):
        check(f"ring bwd {name}", gi, gr)

    # --- 2-D: heads x sequence ---
    mesh2 = make_mesh((2, 4), ("tp", "sp"))
    got = ring_attention_sharded(
        q, k, v, mesh2, seq_axis="sp", head_axis="tp", causal=True
    )
    want = reference_attention(q, k, v, None, is_causal=True, scale=scale)
    check("ring 2d tp x sp", got, want)

    # --- head-parallel TP (GQA co-located) ---
    mesh_tp = make_mesh((4,), ("tp",))
    got = head_parallel_attention(q, k, v, mesh_tp, head_axis="tp", is_causal=True)
    check("tp heads", got, want)

    # --- Ulysses all-to-all SP: fwd + bwd ---
    mesh_sp = make_mesh((4,), ("sp",))
    for causal in (False, True):
        got = ulysses_attention_sharded(
            q, k, v, mesh_sp, seq_axis="sp", causal=causal
        )
        want_u = reference_attention(q, k, v, None, is_causal=causal, scale=scale)
        check(f"ulysses(causal={causal})", got, want_u)

    def uly_loss(q_, k_, v_):
        o = ulysses_attention_sharded(q_, k_, v_, mesh_sp, seq_axis="sp", causal=True)
        return (o.astype(jnp.float32) * do.astype(jnp.float32)).sum()

    g = jax.grad(uly_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, gr, name in zip(g, g_ref, ["dq", "dk", "dv"]):
        check(f"ulysses bwd {name}", gi, gr)

    # --- zigzag load-balanced causal ring: fwd + bwd (incl. GQA KV) ---
    from ffpa_attn_tpu.parallel import zigzag_ring_attention_sharded

    got = zigzag_ring_attention_sharded(q, k, v, mesh_sp, seq_axis="sp")
    want_z = reference_attention(q, k, v, None, is_causal=True, scale=scale)
    check("zigzag causal", got, want_z)

    def zz_loss(q_, k_, v_):
        o = zigzag_ring_attention_sharded(q_, k_, v_, mesh_sp, seq_axis="sp")
        return (o.astype(jnp.float32) * do.astype(jnp.float32)).sum()

    g = jax.grad(zz_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, gr, name in zip(g, g_ref, ["dq", "dk", "dv"]):
        check(f"zigzag bwd {name}", gi, gr)

    kg = jax.random.normal(kk, (b, 2, n, d), dtype=dtype)
    vg = jax.random.normal(kv, (b, 2, n, d), dtype=dtype)
    got = zigzag_ring_attention_sharded(q, kg, vg, mesh_sp, seq_axis="sp")
    want_g = reference_attention(
        q, expand_kv_heads(kg, h), expand_kv_heads(vg, h), None,
        is_causal=True, scale=scale,
    )
    check("zigzag gqa", got, want_g)

    # --- multichip dry run (full train step over dp x tp x sp) ---
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
    print("ALL RING CHECKS PASSED")


if __name__ == "__main__":
    main()
