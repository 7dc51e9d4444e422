"""Paged decode attention: page-gathered KV streaming (ops/paged.py).

Beyond the reference (its serving story ends at dense contiguous caches):
correctness of the page-table indirection, ragged masking, PackGQA packing,
page-boundary appends, and jit/scan composability — all vs the fp32 oracle
over the dense equivalent of the paged contents.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy interpret-mode sweeps: slow tier (fast tier: pytest -m 'not slow').
pytestmark = pytest.mark.slow

from ffpa_attn_tpu import PagedKVCache, append_token, paged_decode_attention
from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def _fill(cache, full_k, full_v, lens):
    """Append max(lens) tokens everywhere (ONE scanned jit — hundreds of
    eager appends dominate suite time otherwise), then set the ragged lens
    (the extra rows become unreachable: masked AND past every table walk)."""

    @jax.jit
    def run(cache, ks_, vs_):
        return jax.lax.scan(
            lambda c, kv: (append_token(c, kv[0], kv[1]), 0), cache, (ks_, vs_)
        )[0]

    c = run(
        cache,
        full_k.transpose(2, 0, 1, 3)[:, :, :, None, :],
        full_v.transpose(2, 0, 1, 3)[:, :, :, None, :],
    )
    return dataclasses.replace(c, lens=jnp.asarray(lens, jnp.int32))


@pytest.mark.parametrize("group", [1, 4])
def test_paged_decode_vs_oracle(group):
    b, hkv, d, page = 3, 2, 320, 128
    hq = hkv * group
    lens = [200, 57, 301]
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    full_k = jax.random.normal(ks[0], (b, hkv, max(lens), d), jnp.bfloat16)
    full_v = jax.random.normal(ks[1], (b, hkv, max(lens), d), jnp.bfloat16)
    q = jax.random.normal(ks[2], (b, hq, 1, d), jnp.bfloat16)

    cache = _fill(
        PagedKVCache.alloc(b, 512, hkv, d, page_size=page), full_k, full_v, lens
    )
    out = paged_decode_attention(q, cache)
    assert out.shape == (b, hq, 1, d)

    for i, n in enumerate(lens):
        ref = reference_attention(
            q[i : i + 1],
            expand_kv_heads(full_k[i : i + 1, :, :n], hq),
            expand_kv_heads(full_v[i : i + 1, :, :n], hq),
            None,
            scale=d**-0.5,
        )
        assert _rel(out[i : i + 1], ref) < 5e-2, f"seq {i} len {n}"


def test_paged_append_crosses_page_boundary():
    """Tokens land in the right page/row, including the first row of a new
    page; lens advances; pages of OTHER sequences are untouched."""
    b, hkv, d, page = 2, 1, 320, 128
    cache = PagedKVCache.alloc(b, 256, hkv, d, page_size=page)
    kkey = jax.random.PRNGKey(1)
    steps = page + 2  # crosses into page 2 of each sequence
    ks = jax.random.normal(kkey, (steps, b, hkv, 1, d), jnp.bfloat16)
    c = jax.jit(
        lambda cc, xs: jax.lax.scan(
            lambda a, x: (append_token(a, x, x), 0), cc, xs
        )[0]
    )(cache, ks)
    assert int(c.lens[0]) == steps
    # Row `page - 1` of page table[0][0], then row 0..1 of table[0][1].
    t0 = np.asarray(c.page_table)
    got_last_in_first = np.asarray(c.k_pages)[t0[0, 0], 0, page - 1]
    np.testing.assert_array_equal(
        got_last_in_first, np.asarray(ks[page - 1, 0, 0, 0], np.float32)
    )
    got_first_in_second = np.asarray(c.k_pages)[t0[0, 1], 0, 0]
    np.testing.assert_array_equal(
        got_first_in_second, np.asarray(ks[page, 0, 0, 0], np.float32)
    )
    # Sequence 1's pages are disjoint from sequence 0's.
    assert set(t0[0]).isdisjoint(set(t0[1]))
    # The reserved null page stays zero.
    assert float(np.abs(np.asarray(c.k_pages)[0]).max()) == 0.0


def test_paged_decode_under_jit_and_scan():
    """The serving shape: appends + paged attention inside one scanned jit
    program (page table and pools are jit-static shapes; lens is traced)."""
    b, hkv, hq, d, page = 2, 2, 4, 320, 128
    prompt = 100
    steps = 4
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    pk = jax.random.normal(ks[0], (b, hkv, prompt, d), jnp.bfloat16)
    pv = jax.random.normal(ks[1], (b, hkv, prompt, d), jnp.bfloat16)
    qs = jax.random.normal(ks[2], (steps, b, hq, 1, d), jnp.bfloat16)

    cache = _fill(
        PagedKVCache.alloc(b, 256, hkv, d, page_size=page),
        pk, pv, [prompt, prompt],
    )

    @jax.jit
    def run(cache, qs):
        def body(c, q_t):
            # Decode step: append the current token's K/V (reuse q_t's
            # values as stand-in K/V), then attend everything cached.
            c = append_token(c, q_t[:, :2], q_t[:, :2])
            return c, paged_decode_attention(q_t, c)

        return jax.lax.scan(body, cache, qs)

    final, outs = run(cache, qs)
    assert outs.shape == (steps, b, hq, 1, d)
    assert bool(jnp.isfinite(outs.astype(jnp.float32)).all())
    assert int(final.lens[0]) == prompt + steps

    # Step 0 against the dense oracle: cache = prompt + the appended token.
    dense_k = jnp.concatenate([pk, qs[0][:, :2]], axis=2)
    dense_v = jnp.concatenate([pv, qs[0][:, :2]], axis=2)
    for i in range(b):
        ref = reference_attention(
            qs[0][i : i + 1],
            expand_kv_heads(dense_k[i : i + 1], hq),
            expand_kv_heads(dense_v[i : i + 1], hq),
            None,
            scale=d**-0.5,
        )
        assert _rel(outs[0][i : i + 1], ref) < 5e-2, f"seq {i}"


def test_paged_empty_sequence_is_finite():
    """lens=0 sequences (freshly allocated slots in a serving pool) must
    produce finite output (the l==0 guard), not NaN."""
    b, hkv, hq, d = 2, 1, 2, 320
    cache = PagedKVCache.alloc(b, 256, hkv, d, page_size=128)
    q = jax.random.normal(jax.random.PRNGKey(3), (b, hq, 1, d), jnp.bfloat16)
    out = paged_decode_attention(q, cache)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_fill_from_prefill_matches_append():
    """Bulk prefill load == token-by-token appends (the two write paths
    agree), and a follow-up append lands after the prefill rows."""
    b, hkv, d, page = 2, 2, 320, 128
    lens = [200, 130]
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    full_k = jax.random.normal(ks[0], (b, hkv, max(lens), d), jnp.bfloat16)
    full_v = jax.random.normal(ks[1], (b, hkv, max(lens), d), jnp.bfloat16)

    from ffpa_attn_tpu.ops.paged import fill_from_prefill

    base = PagedKVCache.alloc(b, 512, hkv, d, page_size=page)
    bulk = fill_from_prefill(base, full_k, full_v, lens)
    slow = _fill(base, full_k, full_v, lens)
    np.testing.assert_array_equal(
        np.asarray(bulk.lens), np.asarray(slow.lens)
    )
    # Reachable rows agree (rows past lens[b] are unreachable and may
    # differ: bulk writes padded garbage-rows, append never writes them).
    t = np.asarray(bulk.page_table)
    for i, n in enumerate(lens):
        for tok in range(n):
            pg, row = t[i, tok // page], tok % page
            np.testing.assert_array_equal(
                np.asarray(bulk.k_pages)[pg, :, row],
                np.asarray(slow.k_pages)[pg, :, row],
                err_msg=f"seq {i} tok {tok}",
            )
        break  # seq 0 full check; seq 1 spot-checked below
    pg, row = t[1, lens[1] // page], lens[1] % page  # next write slot
    nk = jax.random.normal(ks[2], (b, hkv, 1, d), jnp.bfloat16)
    bumped = append_token(bulk, nk, nk)
    np.testing.assert_array_equal(
        np.asarray(bumped.k_pages)[pg, :, row],
        np.asarray(nk[1, :, 0], np.float32),
    )

    # And attention over the bulk-filled cache matches the oracle.
    q = jax.random.normal(ks[2], (b, hkv, 1, d), jnp.bfloat16)
    out = paged_decode_attention(q, bulk)
    for i, n in enumerate(lens):
        ref = reference_attention(
            q[i : i + 1], full_k[i : i + 1, :, :n], full_v[i : i + 1, :, :n],
            None, scale=d**-0.5,
        )
        assert _rel(out[i : i + 1], ref) < 5e-2, f"seq {i}"


def test_paged_append_overflow_is_inert():
    """Appending past pool capacity must not corrupt stored tokens: the
    write is soaked by the null page and lens freezes at capacity (JAX's
    clamped gather/DUS would otherwise silently overwrite the LAST page)."""
    b, hkv, d, page = 1, 1, 320, 128
    cap = 128  # one page
    cache = PagedKVCache.alloc(b, cap, hkv, d, page_size=page)
    ks = jax.random.normal(jax.random.PRNGKey(7), (cap + 3, b, hkv, 1, d),
                           jnp.bfloat16)
    c = jax.jit(
        lambda cc, xs: jax.lax.scan(
            lambda a, x: (append_token(a, x, x), 0), cc, xs
        )[0]
    )(cache, ks)
    assert int(c.lens[0]) == cap  # frozen at capacity
    t0 = np.asarray(c.page_table)
    # Token 0 and the last in-capacity token survive untouched.
    np.testing.assert_array_equal(
        np.asarray(c.k_pages)[t0[0, 0], 0, 0],
        np.asarray(ks[0, 0, 0, 0], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(c.k_pages)[t0[0, 0], 0, page - 1],
        np.asarray(ks[cap - 1, 0, 0, 0], np.float32),
    )


def test_page_allocator_admission_eviction():
    """Host-side page churn: both slots get allocator-assigned page runs
    (slot 0 deliberately SHUFFLED/non-contiguous), fill + attend match the
    oracle; exhaustion returns None; double-free rejected; released pages
    are re-acquirable."""
    from ffpa_attn_tpu.ops.paged import (
        PageAllocator, assign_sequence, fill_from_prefill,
    )

    b, hkv, hq, d, page = 2, 1, 2, 320, 128
    cache = PagedKVCache.alloc(b, 256, hkv, d, page_size=page)  # 4 pages + null
    alloc = PageAllocator(num_pages=1 + 4, reserved=1)

    first = alloc.acquire(2)
    second = alloc.acquire(2)
    assert first is not None and second is not None
    assert alloc.acquire(1) is None  # pool exhausted

    # Slot 0 walks its pages in DECREASING pool order (non-contiguous walk);
    # slot 1 in natural order. No page is shared between slots.
    cache = assign_sequence(cache, 0, list(reversed(first)))
    cache = assign_sequence(cache, 1, second)
    assert int(cache.lens[0]) == 0 and int(cache.lens[1]) == 0

    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    n = page + 40  # spans both pages of each slot
    fk = jax.random.normal(ks[0], (b, hkv, n, d), jnp.bfloat16)
    fv = jax.random.normal(ks[1], (b, hkv, n, d), jnp.bfloat16)
    cache = fill_from_prefill(cache, fk, fv, [n, n])
    q = jax.random.normal(ks[2], (b, hq, 1, d), jnp.bfloat16)
    out = paged_decode_attention(q, cache)
    for i in range(b):
        ref = reference_attention(
            q[i : i + 1], expand_kv_heads(fk[i : i + 1], hq),
            expand_kv_heads(fv[i : i + 1], hq), None, scale=d**-0.5,
        )
        assert _rel(out[i : i + 1], ref) < 5e-2, f"slot {i}"

    # Eviction: release slot 1, double-free rejected, pages re-acquirable.
    alloc.release(second)
    with pytest.raises(ValueError):
        alloc.release(second)
    assert alloc.acquire(2) is not None


@pytest.mark.parametrize("page", [128, 256])
def test_paged_decode_int8_pool(page):
    """int8 KV pool (alloc(quantized=True)): halves the decode kernel's
    HBM stream; per-row symmetric amax scaling keeps error at bf16 levels
    (int8 values are exact in bf16; dequant folds into [bq, page]-sized
    multiplies on S and P). Fill + append + attend vs the fp oracle, and
    vs the bf16 pool (quantization-only delta). Parametrized over page
    size: the round-4 scales layout lowered at page=128 but crashed
    Mosaic at page=256 (lane-axis scales lower at every page size)."""
    from ffpa_attn_tpu.ops.paged import fill_from_prefill

    b, hkv, hq, d = 2, 2, 8, 320
    lens = [200, 77]
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    fk = jax.random.normal(ks[0], (b, hkv, max(lens), d), jnp.bfloat16)
    fv = jax.random.normal(ks[1], (b, hkv, max(lens), d), jnp.bfloat16)
    q = jax.random.normal(ks[2], (b, hq, 1, d), jnp.bfloat16)

    c8 = fill_from_prefill(
        PagedKVCache.alloc(b, 512, hkv, d, page_size=page, quantized=True),
        fk, fv, lens,
    )
    assert c8.k_pages.dtype == jnp.int8 and c8.quantized
    c16 = fill_from_prefill(
        PagedKVCache.alloc(b, 512, hkv, d, page_size=page), fk, fv, lens
    )

    # Appends quantize incrementally (both pools get the same token).
    nk = jax.random.normal(ks[3], (b, hkv, 1, d), jnp.bfloat16)
    c8 = append_token(c8, nk, nk)
    c16 = append_token(c16, nk, nk)

    o8 = paged_decode_attention(q, c8)
    o16 = paged_decode_attention(q, c16)
    # Quantization-only delta is small.
    assert _rel(o8, o16) < 2e-2, _rel(o8, o16)
    for i, n in enumerate(lens):
        dk = jnp.concatenate([fk[i : i + 1, :, :n], nk[i : i + 1]], axis=2)
        dv = jnp.concatenate([fv[i : i + 1, :, :n], nk[i : i + 1]], axis=2)
        ref = reference_attention(
            q[i : i + 1], expand_kv_heads(dk, hq), expand_kv_heads(dv, hq),
            None, scale=d**-0.5,
        )
        assert _rel(o8[i : i + 1], ref) < 5e-2, f"seq {i}"


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_speculative_tail(quantized):
    """nq>1 (speculative decoding): all nq new tokens appended, token t
    attends [0, lens - (nq-1) + t) — matches the dense causal oracle on the
    equivalent suffix rows."""
    from ffpa_attn_tpu.ops.paged import fill_from_prefill

    b, hkv, hq, d, page, nq = 2, 2, 4, 320, 128, 4
    base = [150, 90]
    ks = jax.random.split(jax.random.PRNGKey(31), 4)
    fk = jax.random.normal(ks[0], (b, hkv, max(base) + nq, d), jnp.bfloat16)
    fv = jax.random.normal(ks[1], (b, hkv, max(base) + nq, d), jnp.bfloat16)
    q = jax.random.normal(ks[2], (b, hq, nq, d), jnp.bfloat16)

    # Cache holds base[b] + nq tokens per sequence (prompt + the tail).
    cache = fill_from_prefill(
        PagedKVCache.alloc(b, 256, hkv, d, page_size=page, quantized=quantized),
        fk, fv, [n + nq for n in base],
    )
    out = paged_decode_attention(q, cache)
    assert out.shape == (b, hq, nq, d)

    for i, n in enumerate(base):
        total = n + nq
        # Dense causal oracle over the full prefix; take the last nq rows.
        qfull = jnp.concatenate(
            [jnp.zeros((1, hq, total - nq, d), jnp.bfloat16), q[i : i + 1]],
            axis=2,
        )
        ref = reference_attention(
            qfull,
            expand_kv_heads(fk[i : i + 1, :, :total], hq),
            expand_kv_heads(fv[i : i + 1, :, :total], hq),
            None, is_causal=True, scale=d**-0.5,
        )[:, :, -nq:]
        tol = 5e-2 if not quantized else 6e-2
        assert _rel(out[i : i + 1], ref) < tol, f"seq {i} q={quantized}"


def test_paged_window_softcap_sinks():
    """Windowed paged decode (page-walk clamp) + softcap + sinks vs the
    dense oracle over each sequence's true rows; releasable_lead_pages
    accounting checked against the kernel's page-walk bound."""
    import numpy as np

    from ffpa_attn_tpu.ops.paged import (
        PagedKVCache,
        fill_from_prefill,
        paged_decode_attention,
        releasable_lead_pages,
    )
    from ffpa_attn_tpu.ops.reference import (
        expand_kv_heads,
        reference_attention,
    )

    b, hq, hkv, d, page = 2, 4, 2, 320, 64
    max_len = 512
    lens = jnp.asarray([450, 200], jnp.int32)
    key = jax.random.PRNGKey(50)
    kq, kk, kv, ks = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, hq, 1, d), jnp.bfloat16)
    k_dense = jax.random.normal(kk, (b, hkv, max_len, d), jnp.bfloat16)
    v_dense = jax.random.normal(kv, (b, hkv, max_len, d), jnp.bfloat16)
    sinks = jax.random.normal(ks, (hq,), jnp.float32) * 0.5

    cache = PagedKVCache.alloc(b, max_len, hkv, d, page_size=page)
    cache = fill_from_prefill(cache, k_dense, v_dense, lens)

    w = 128
    out = paged_decode_attention(
        q, cache, scale=d**-0.5, window_left=w, softcap=25.0, sinks=sinks
    )
    for i in range(b):
        n = int(lens[i])
        ref = reference_attention(
            q[i : i + 1],
            expand_kv_heads(k_dense[i : i + 1, :, :n], hq),
            expand_kv_heads(v_dense[i : i + 1, :, :n], hq),
            is_causal=True,
            window=(w, -1),
            softcap=25.0,
            sinks=sinks,
            scale=d**-0.5,
        )
        gg = np.asarray(out[i], np.float32)
        rr = np.asarray(ref[0], np.float32)
        rel = np.max(np.abs(gg - rr)) / (np.max(np.abs(rr)) + 1e-9)
        assert rel < 3e-2, (i, rel)

    # Page accounting: leading pages the walk can no longer touch.
    rel_pages = releasable_lead_pages(lens, w, page, nq=1)
    first_needed = np.maximum(np.asarray(lens) - 1 - w, 0)
    assert (rel_pages * page <= first_needed).all()
    # A sequence of 450 with W=128: positions < 321 dead -> 5 full pages.
    assert rel_pages[0] == (450 - 1 - 128) // 64
