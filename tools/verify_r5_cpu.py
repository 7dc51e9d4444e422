"""Round-5 verify: drive the public package surface (CPU/interpret lane).

The chip is held by the r5 autotune campaign; this runs the verify-skill
flows off-TPU (Pallas interpret mode), including the round-5 additions:
the fp16 PV-mode knob and the grouped decode composite vjp.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import ffpa_attn_tpu
from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
from ffpa_attn_tpu.ops.reference import reference_attention, expand_kv_heads

PASS = []


def check(name, ok, detail=""):
    PASS.append((name, bool(ok)))
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}")


def mk(b, hq, hkv, nq, nkv, d, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, hq, nq, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, nkv, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, nkv, d), dtype)
    return q, k, v


# 1. causal large-D fwd vs oracle
q, k, v = mk(1, 4, 4, 256, 256, 640)
o = ffpa_attn_func(q, k, v, is_causal=True)
ref = reference_attention(q, k, v, is_causal=True)
err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
check("causal D640 bf16 fwd", err < 5e-2, f"err={err:.2e}")

qf, kf, vf = mk(1, 2, 2, 192, 192, 512, jnp.float16, seed=1)
of = ffpa_attn_func(qf, kf, vf, is_causal=True)
reff = reference_attention(qf, kf, vf, is_causal=True)
errf = float(jnp.max(
    jnp.abs(of.astype(jnp.float32) - reff) / (1e-2 + 1e-2 * jnp.abs(reff))
))
check("causal D512 fp16 fwd (1e-2 atol+rtol)", errf < 1.0, f"ratio={errf:.2f}")

# 2. jax.grad through ffpa_attn_func (bf16 + fp16 in each PV mode)
def loss(q, k, v):
    return ffpa_attn_func(q, k, v, is_causal=True).astype(jnp.float32).sum()

g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
check(
    "bf16 grads finite+dtype",
    all(jnp.isfinite(x).all() and x.dtype == jnp.bfloat16 for x in g),
)

for mode in ("hilo", "psplit", "plain"):
    os.environ["FFPA_TPU_F16_PV_MODE"] = mode
    jax.clear_caches()
    gf = jax.grad(loss, argnums=(0, 1, 2))(qf, kf, vf)
    ok = all(jnp.isfinite(x).all() and x.dtype == jnp.float16 for x in gf)
    # oracle check at the repo's test scale (N=192): every mode must hold 1e-2
    gref = jax.grad(
        lambda a, b, c: reference_attention(a, b, c, is_causal=True).sum(),
        argnums=(0, 1, 2),
    )(qf.astype(jnp.float32), kf.astype(jnp.float32), vf.astype(jnp.float32))
    rel = max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - r) / (1e-2 + 1e-2 * jnp.abs(r))))
        for x, r in zip(gf, gref)
    )
    check(f"fp16 grads mode={mode}", ok and rel < 1.0, f"contract_ratio={rel:.2f}")
os.environ.pop("FFPA_TPU_F16_PV_MODE", None)
jax.clear_caches()

# 3. decode Nq=1 (MHA + GQA), incl. grads through the grouped composite
qd, kd, vd = mk(2, 8, 8, 1, 2048, 512)
od = ffpa_attn_func(qd, kd, vd)
refd = reference_attention(qd, kd, vd)
errd = float(jnp.max(jnp.abs(od.astype(jnp.float32) - refd)))
check("decode MHA Nq=1 fwd", errd < 5e-2, f"err={errd:.2e}")

qg, kg, vg = mk(2, 8, 2, 1, 1024, 512, seed=3)
og = ffpa_attn_func(qg, kg, vg, enable_gqa=True)
refg = reference_attention(qg, expand_kv_heads(kg, 8), expand_kv_heads(vg, 8))
errg = float(jnp.max(jnp.abs(og.astype(jnp.float32) - refg)))
check("decode GQA 4:1 fwd", errg < 5e-2, f"err={errg:.2e}")

gg = jax.grad(
    lambda a, b, c: ffpa_attn_func(a, b, c, enable_gqa=True).astype(jnp.float32).sum(),
    argnums=(0, 1, 2),
)(qg, kg, vg)
ggref = jax.grad(
    lambda a, b, c: reference_attention(
        a, expand_kv_heads(b, 8), expand_kv_heads(c, 8)).sum(),
    argnums=(0, 1, 2),
)(qg.astype(jnp.float32), kg.astype(jnp.float32), vg.astype(jnp.float32))
relg = max(
    float(jnp.max(jnp.abs(x.astype(jnp.float32) - r)))
    for x, r in zip(gg, ggref)
)
check("decode GQA grouped-composite grads", relg < 5e-2, f"err={relg:.2e}")

# varlen
total, h, d = 512, 4, 512
cu = jnp.array([0, 128, 320, 512], jnp.int32)
qv = jax.random.normal(jax.random.PRNGKey(7), (total, h, d), jnp.bfloat16)
kv_ = jax.random.normal(jax.random.PRNGKey(8), (total, h, d), jnp.bfloat16)
vv = jax.random.normal(jax.random.PRNGKey(9), (total, h, d), jnp.bfloat16)
ov = ffpa_attn_varlen_func(qv, kv_, vv, cu_seqlens_q=cu, cu_seqlens_k=cu,
                           max_seqlen_q=192, max_seqlen_k=192, causal=True)
segs = []
for i in range(3):
    s, e = int(cu[i]), int(cu[i + 1])
    segs.append(
        reference_attention(
            qv[s:e].swapaxes(0, 1)[None], kv_[s:e].swapaxes(0, 1)[None],
            vv[s:e].swapaxes(0, 1)[None], is_causal=True,
        )[0].swapaxes(0, 1)
    )
refv = jnp.concatenate(segs, 0)
errv = float(jnp.max(jnp.abs(ov.astype(jnp.float32) - refv)))
check("varlen 3-seg causal", errv < 5e-2, f"err={errv:.2e}")

# 4. error taxonomy
try:
    ffpa_attn_func(q, k, v, bogus_kwarg=1)
    check("bogus kwarg -> TypeError", False)
except TypeError:
    check("bogus kwarg -> TypeError", True)

try:
    q2, k2, v2 = mk(1, 4, 4, 256, 128, 512)
    ffpa_attn_func(q2, k2, v2, is_causal=True)
    check("causal Nkv<Nq -> ValueError", False)
except ValueError:
    check("causal Nkv<Nq -> ValueError", True)

try:
    q3, k3, v3 = mk(1, 8, 2, 128, 128, 512)
    ffpa_attn_func(q3, k3, v3)  # no enable_gqa
    check("head mismatch w/o enable_gqa -> ValueError", False)
except ValueError:
    check("head mismatch w/o enable_gqa -> ValueError", True)

q4, k4, v4 = mk(1, 2, 2, 64, 64, 1280)
o4 = ffpa_attn_func(q4, k4, v4)
check("D>1024 silent fallback finite", bool(jnp.isfinite(o4.astype(jnp.float32)).all()))

n_fail = sum(1 for _, ok in PASS if not ok)
print(f"\nverify-r5-cpu: {len(PASS) - n_fail}/{len(PASS)} passed")
raise SystemExit(1 if n_fail else 0)
