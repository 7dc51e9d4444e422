"""Multi-device sharding tests (ring attention, TP, dryrun train step).

These need >= 8 devices, so they run in a subprocess with an 8-device CPU
mesh (the SURVEY.md §4 recommendation: real multi-host tests the reference
lacks, CPU-simulable via xla_force_host_platform_device_count).
"""

import os
import subprocess
import sys

import pytest

# Heavy interpret-mode sweeps: slow tier (fast tier: pytest -m 'not slow').
pytestmark = pytest.mark.slow


def test_ring_and_tp_on_cpu_mesh():
    script = os.path.join(os.path.dirname(__file__), "_ring_check.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # The axon sitecustomize registers the TPU plugin whenever
    # PALLAS_AXON_POOL_IPS is set; scrub it so the child is a clean CPU host.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    result = subprocess.run(
        [sys.executable, script],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert result.returncode == 0, (
        f"ring check failed\nstdout:\n{result.stdout}\nstderr:\n{result.stderr[-3000:]}"
    )
    assert "ALL RING CHECKS PASSED" in result.stdout


def test_zigzag_shuffle_roundtrip():
    import jax.numpy as jnp
    import numpy as np

    from ffpa_attn_tpu.parallel.zigzag import zigzag_shuffle, zigzag_unshuffle

    x = jnp.arange(2 * 3 * 16 * 4).reshape(2, 3, 16, 4)
    for s in (2, 4):
        z = zigzag_shuffle(x, s)
        back = zigzag_unshuffle(z, s)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
        # chip s's first chunk is natural chunk s, second is 2S-1-s
        c = 16 // (2 * s)
        zc = np.asarray(z).reshape(2, 3, 2 * s, c, 4)
        xc = np.asarray(x).reshape(2, 3, 2 * s, c, 4)
        for i in range(s):
            np.testing.assert_array_equal(zc[:, :, 2 * i], xc[:, :, i])
            np.testing.assert_array_equal(
                zc[:, :, 2 * i + 1], xc[:, :, 2 * s - 1 - i]
            )


def test_ring_scaling_projection():
    """Analytic comms/compute model for the >= 85% 2-host target: full
    overlap when the per-step hop fits under the step's matmuls; GQA
    rotates only KV heads (parallel/analysis.py)."""
    from ffpa_attn_tpu.parallel.analysis import ring_scaling_projection

    # Small S: compute-dominated, ~perfect scaling.
    p4 = ring_scaling_projection(b=1, h=32, n=16384, d=512, chips=4)
    assert p4.efficiency > 0.95
    # MHA at S=8/N=16K is hop-bound; 4:1 GQA restores >= 85%.
    p8 = ring_scaling_projection(b=1, h=32, n=16384, d=512, chips=8)
    p8g = ring_scaling_projection(b=1, h=32, hkv=8, n=16384, d=512, chips=8)
    assert p8.efficiency < p8g.efficiency
    assert p8g.efficiency > 0.85
    # Cross-slice (DCN) hops throttle the rotation.
    pd = ring_scaling_projection(
        b=1, h=32, n=16384, d=512, chips=8, hops_over_dcn=2
    )
    assert pd.efficiency < p8.efficiency


def test_paged_decode_head_sharded():
    """Paged decode under TP: pools shard on the Hkv axis (each device
    owns its KV heads' pages — serving cache memory scales down with TP),
    tables/lens replicate; matches the unsharded paged kernel."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ffpa_attn_tpu.ops.paged import (
        PagedKVCache, fill_from_prefill, paged_decode_attention,
    )
    from ffpa_attn_tpu.parallel import paged_head_parallel_decode

    devs = jax.devices()
    assert len(devs) >= 4
    mesh = Mesh(np.asarray(devs[:4]).reshape(4), ("tp",))

    b, hkv, hq, d, page = 2, 4, 8, 320, 128
    lens = [200, 77]
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    full_k = jax.random.normal(ks[0], (b, hkv, max(lens), d), jnp.bfloat16)
    full_v = jax.random.normal(ks[1], (b, hkv, max(lens), d), jnp.bfloat16)
    q = jax.random.normal(ks[2], (b, hq, 1, d), jnp.bfloat16)
    cache = fill_from_prefill(
        PagedKVCache.alloc(b, 256, hkv, d, page_size=page),
        full_k, full_v, lens,
    )

    want = paged_decode_attention(q, cache)
    got = paged_head_parallel_decode(q, cache, mesh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_window_halo_exchange_on_cpu_mesh():
    """Sequence-sharded sliding-window attention via halo exchange
    (parallel/window.py): fwd + grads vs the dense oracle on an 8-device
    mesh, incl. a 2-halo window and the softcap/sinks compose."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ffpa_attn_tpu.parallel import window_attention_sharded
    from ffpa_attn_tpu.ops.reference import (
        expand_kv_heads,
        reduce_q_heads,
        reference_attention,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    b, hq, hkv, n, d = 1, 4, 2, 2048, 320
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, hq, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, n, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, hq, n, d), jnp.bfloat16)
    sinks = jnp.asarray([0.3, 0.0, -0.2, 0.5], jnp.float32)

    def rel(a, bb):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        return float(np.max(np.abs(a - bb)) / (np.max(np.abs(bb)) + 1e-9))

    for w in (200, 400):  # Nl=256: one- and two-shard halos
        out = window_attention_sharded(q, k, v, mesh, window_left=w)
        ref = reference_attention(
            q, expand_kv_heads(k, hq), expand_kv_heads(v, hq),
            is_causal=True, window=(w, -1),
        )
        assert rel(out, ref) < 3e-2, (w, rel(out, ref))

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_).astype(jnp.float32) * do.astype(jnp.float32)
        )

    got = jax.grad(
        loss(lambda a, b_, c: window_attention_sharded(
            a, b_, c, mesh, window_left=200, softcap=25.0, sinks=sinks,
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref_g = jax.grad(
        loss(lambda a, b_, c: reference_attention(
            a.astype(jnp.float32),
            expand_kv_heads(b_, hq).astype(jnp.float32),
            expand_kv_heads(c, hq).astype(jnp.float32),
            is_causal=True, window=(200, -1), softcap=25.0, sinks=sinks,
        ).astype(jnp.bfloat16)),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref_g = (ref_g[0], reduce_q_heads(ref_g[1], hkv), reduce_q_heads(ref_g[2], hkv))
    for n_, g, r in zip("qkv", got, ref_g):
        assert rel(g, r) < 6e-2, (n_, rel(g, r))


def test_window_model_trains_under_sp_mesh():
    """Flagship model with a sliding-window config trains under the sp
    mesh (halo-exchange path replaces the ring for window configs)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ffpa_attn_tpu.models import (
        ModelConfig,
        init_params,
        make_train_step,
    )

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("sp", "tp"))
    cfg = ModelConfig(
        vocab_size=64,
        d_model=64,
        n_layers=1,
        n_heads=2,
        n_kv_heads=2,
        head_dim=320,
        max_seq_len=512,
        dtype="bfloat16",
        sliding_window=96,
        attn_softcap=30.0,
        attn_sinks=True,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer, mesh=mesh, sp_axis="sp", dp_axis=None)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 513), 0, cfg.vocab_size)
    tokens = jax.device_put(tokens, NamedSharding(mesh, P()))
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_ulysses_features_on_cpu_mesh():
    """Ulysses all-to-all sharding composes with every extension feature:
    each chip holds the full sequence for its head block, per-head
    operands (slopes, sinks) slice by axis_index."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ffpa_attn_tpu.parallel import ulysses_attention_sharded
    from ffpa_attn_tpu.ops.reference import reference_attention

    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    b, h, n, d = 1, 4, 1024, 320
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, n, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, h, n, d), jnp.bfloat16)
    sl = jnp.asarray([0.01, 0.02, 0.03, 0.04], jnp.float32)
    sinks = jnp.asarray([0.3, 0.0, -0.2, 0.5], jnp.float32)
    fkw = dict(causal=True, softcap=25.0, window=(256, -1),
               alibi_slopes=sl, sinks=sinks)
    rkw = dict(is_causal=True, softcap=25.0, window=(256, -1),
               alibi_slopes=sl, sinks=sinks)

    def rel(a, bb):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        return float(np.max(np.abs(a - bb)) / (np.max(np.abs(bb)) + 1e-9))

    out = ulysses_attention_sharded(q, k, v, mesh, **fkw)
    ref = reference_attention(q, k, v, **rkw)
    assert rel(out, ref) < 3e-2, rel(out, ref)

    g = jax.grad(lambda q_: jnp.sum(
        ulysses_attention_sharded(q_, k, v, mesh, **fkw).astype(jnp.float32)
        * do.astype(jnp.float32)
    ))(q)
    gr = jax.grad(lambda q_: jnp.sum(reference_attention(
        q_.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), **rkw,
    ).astype(jnp.float32) * do.astype(jnp.float32)))(q)
    assert rel(g, gr) < 6e-2, rel(g, gr)
