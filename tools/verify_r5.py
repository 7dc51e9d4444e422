"""Round-5 verify: drive the public surface on the attached chip.

Covers the standard flows plus this round's changed surfaces: the grouped
decode composite backward (MHA + GQA), the page-256 int8 paged pools, and
the jitted serving prefills.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_r5.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
from ffpa_attn_tpu.ops.reference import (
    expand_kv_heads, reference_attention,
)

PASS = []


def check(name, ok, detail=""):
    PASS.append((name, bool(ok)))
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)


def rel(a, b):
    a = np.asarray(jax.device_get(a), np.float32)
    b = np.asarray(jax.device_get(b), np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def mk(b, hq, hkv, nq, nkv, d, dt=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (
        jax.random.normal(ks[0], (b, hq, nq, d), dt),
        jax.random.normal(ks[1], (b, hkv, nkv, d), dt),
        jax.random.normal(ks[2], (b, hkv, nkv, d), dt),
        jax.random.normal(ks[3], (b, hq, nq, d), dt),
    )


def main():
    print(jax.devices(), flush=True)

    # 1. causal large-D fwd vs oracle
    q, k, v, _ = mk(1, 4, 4, 1024, 1024, 640)
    out = ffpa_attn_func(q, k, v, is_causal=True)
    ref = reference_attention(q, k, v, None, is_causal=True, scale=640**-0.5)
    check("causal D640 fwd", rel(out, ref) < 5e-2, f"rel={rel(out, ref):.2e}")

    # 2. grads through ffpa_attn_func (dense)
    def loss(fn, *a):
        return (fn(*a).astype(jnp.float32) * do.astype(jnp.float32)).sum()

    q, k, v, do = mk(1, 4, 4, 512, 512, 512)
    g = jax.grad(lambda a, b, c: loss(
        lambda *t: ffpa_attn_func(*t, is_causal=True), a, b, c
    ), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: loss(
        lambda *t: reference_attention(
            *t, None, is_causal=True, scale=512**-0.5
        ), a, b, c
    ), argnums=(0, 1, 2))(q, k, v)
    ok = all(rel(x, y) < 5e-2 for x, y in zip(g, gr)) and all(
        x.dtype == jnp.bfloat16 for x in g
    )
    check("dense causal grads", ok,
          f"rels={[f'{rel(x, y):.1e}' for x, y in zip(g, gr)]}")

    # 3a. decode MHA grads (this round: composite routing)
    q, k, v, do = mk(1, 8, 8, 1, 4096, 512)
    g = jax.grad(lambda a, b, c: loss(
        lambda *t: ffpa_attn_func(*t), a, b, c
    ), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: loss(
        lambda *t: reference_attention(*t, None, scale=512**-0.5), a, b, c
    ), argnums=(0, 1, 2))(q, k, v)
    check("decode MHA grads", all(rel(x, y) < 5e-2 for x, y in zip(g, gr)))

    # 3b. decode GQA fwd + grads (this round: grouped composite + from-S)
    q, k, v, do = mk(1, 16, 4, 1, 4096, 512)
    out = ffpa_attn_func(q, k, v, enable_gqa=True)
    ref = reference_attention(
        q, expand_kv_heads(k, 16), expand_kv_heads(v, 16), None,
        scale=512**-0.5,
    )
    check("decode GQA fwd", rel(out, ref) < 5e-2)
    g = jax.grad(lambda a, b, c: loss(
        lambda *t: ffpa_attn_func(*t, enable_gqa=True), a, b, c
    ), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: loss(
        lambda a_, b_, c_: reference_attention(
            a_, expand_kv_heads(b_, 16), expand_kv_heads(c_, 16), None,
            scale=512**-0.5,
        ), a, b, c
    ), argnums=(0, 1, 2))(q, k, v)
    ok = all(rel(x, y) < 5e-2 for x, y in zip(g, gr))
    ok = ok and g[1].shape == k.shape and g[2].shape == v.shape
    check("decode GQA grads (grouped composite)", ok,
          f"rels={[f'{rel(x, y):.1e}' for x, y in zip(g, gr)]}")

    # 3c. varlen
    t = 1024
    cu = jnp.asarray([0, 300, 1024], jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    qv = jax.random.normal(ks[0], (t, 8, 320), jnp.bfloat16)
    kv_ = jax.random.normal(ks[1], (t, 8, 320), jnp.bfloat16)
    vv = jax.random.normal(ks[2], (t, 8, 320), jnp.bfloat16)
    ov = ffpa_attn_varlen_func(qv, kv_, vv, cu, cu, 1024, 1024, causal=True)
    seg_ref = []
    for i in range(2):
        s, e = int(cu[i]), int(cu[i + 1])
        r = reference_attention(
            qv[s:e].transpose(1, 0, 2)[None],
            kv_[s:e].transpose(1, 0, 2)[None],
            vv[s:e].transpose(1, 0, 2)[None],
            None, is_causal=True, scale=320**-0.5,
        )[0].transpose(1, 0, 2)
        seg_ref.append(r)
    check("varlen causal", rel(ov, jnp.concatenate(seg_ref)) < 5e-2)

    # 4. error taxonomy
    q, k, v, _ = mk(1, 4, 4, 256, 256, 320)
    try:
        ffpa_attn_func(q, k, v, bogus_kwarg=1)
        check("bogus kwarg TypeError", False)
    except TypeError:
        check("bogus kwarg TypeError", True)
    try:
        q2, k2, v2, _ = mk(1, 4, 4, 512, 256, 320)
        ffpa_attn_func(q2, k2, v2, is_causal=True)
        check("causal Nkv<Nq ValueError", False)
    except ValueError:
        check("causal Nkv<Nq ValueError", True)
    try:
        q2, k2, v2, _ = mk(1, 8, 4, 256, 256, 320)
        ffpa_attn_func(q2, k2, v2)  # no enable_gqa
        check("head mismatch ValueError", False)
    except ValueError:
        check("head mismatch ValueError", True)
    q2, k2, v2, _ = mk(1, 2, 2, 256, 256, 1152)
    out = ffpa_attn_func(q2, k2, v2)
    check("D>1024 fallback finite", bool(jnp.isfinite(out).all()))

    # 5. paged int8 at page 256 (this round's lowering fix) on device
    import dataclasses

    from ffpa_attn_tpu import PagedKVCache, paged_decode_attention
    from ffpa_attn_tpu.ops.paged import fill_from_prefill

    b, hkv, hq, d, page = 2, 2, 8, 512, 256
    lens = [300, 129]
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    fk = jax.random.normal(ks[0], (b, hkv, max(lens), d), jnp.bfloat16)
    fv = jax.random.normal(ks[1], (b, hkv, max(lens), d), jnp.bfloat16)
    qq = jax.random.normal(ks[2], (b, hq, 1, d), jnp.bfloat16)
    c8 = fill_from_prefill(
        PagedKVCache.alloc(b, 512, hkv, d, page_size=page, quantized=True),
        fk, fv, lens,
    )
    out = jax.jit(paged_decode_attention)(qq, c8)
    ok = True
    for i, n in enumerate(lens):
        want = reference_attention(
            qq[i : i + 1], expand_kv_heads(fk[i : i + 1, :, :n], hq),
            expand_kv_heads(fv[i : i + 1, :, :n], hq), None, scale=d**-0.5,
        )
        ok = ok and rel(out[i : i + 1], want) < 6e-2
    check("paged int8 page256 decode", ok)

    # 6. serving end-to-end (jitted prefill this round)
    from ffpa_attn_tpu.models import ModelConfig, init_params
    from ffpa_attn_tpu.models.serving import serve_batch, serve_batch_paged

    cfg = ModelConfig(
        vocab_size=512, d_model=256, n_layers=2, n_heads=4, n_kv_heads=2,
        head_dim=320, max_seq_len=320,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    prompts = [
        jnp.asarray(rng.integers(0, 512, (ln,)), jnp.int32)
        for ln in (120, 64)
    ]
    toks_d = serve_batch(params, prompts, 8, cfg, 320)
    toks_p = serve_batch_paged(
        params, prompts, 8, cfg, 320, page_size=128
    )
    same = bool(jnp.all(toks_d == toks_p))
    check("serve dense==paged greedy tokens", same,
          f"dense={np.asarray(toks_d[0])[:6]} paged={np.asarray(toks_p[0])[:6]}")

    # 7. monkey-patch surface
    from ffpa_attn_tpu import patch_dot_product_attention

    from ffpa_attn_tpu import unpatch_dot_product_attention

    patch_dot_product_attention()
    try:
        q, k, v, _ = mk(1, 4, 4, 1024, 1024, 512)
        out = jax.nn.dot_product_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), is_causal=True,
        )
        ref = reference_attention(
            q, k, v, None, is_causal=True, scale=512**-0.5
        )
        check("monkey-patch dpa", rel(jnp.swapaxes(out, 1, 2), ref) < 5e-2)
    finally:
        unpatch_dot_product_attention()

    n_fail = sum(1 for _, ok in PASS if not ok)
    print(f"== verify_r5: {len(PASS) - n_fail}/{len(PASS)} passed", flush=True)
    raise SystemExit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
