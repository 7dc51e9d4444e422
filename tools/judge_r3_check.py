"""Judge round-3 independent on-chip spot check."""
import jax
import jax.numpy as jnp

from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
from ffpa_attn_tpu.ops.reference import reference_attention, expand_kv_heads

print("devices:", jax.devices())
key = jax.random.PRNGKey(7)


def err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


# 1. causal large-D fwd+bwd vs oracle, D=640 GQA dropout-free (BASELINE cfg3 shape-ish)
b, hq, hkv, n, d = 1, 8, 2, 2048, 640
q = jax.random.normal(key, (b, hq, n, d), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(8), (b, hkv, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(9), (b, hkv, n, d), jnp.bfloat16)

o = ffpa_attn_func(q, k, v, is_causal=True, enable_gqa=True)
o_ref = reference_attention(
    q, expand_kv_heads(k, hq), expand_kv_heads(v, hq), None, is_causal=True,
    scale=1.0 / d ** 0.5,
)
print("D640 GQA causal fwd err:", err(o, o_ref))


def loss(q_, k_, v_):
    return jnp.sum(ffpa_attn_func(q_, k_, v_, is_causal=True, enable_gqa=True).astype(jnp.float32) ** 2)


def loss_ref(q_, k_, v_):
    return jnp.sum(
        reference_attention(
            q_, expand_kv_heads(k_, hq), expand_kv_heads(v_, hq), None,
            is_causal=True, scale=1.0 / d ** 0.5,
        ).astype(jnp.float32) ** 2
    )


g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
for name, a_, b_ in zip("dq dk dv".split(), g, gr):
    print(f"D640 GQA causal {name} err:", err(a_, b_))

# 2. D=768 cross-attn with additive mask
nq, nkv, d2 = 512, 2048, 768
q2 = jax.random.normal(key, (1, 4, nq, d2), jnp.bfloat16)
k2 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, nkv, d2), jnp.bfloat16)
v2 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, nkv, d2), jnp.bfloat16)
mask = (jax.random.uniform(jax.random.PRNGKey(4), (1, 1, nq, nkv)) > 0.1)
o2 = ffpa_attn_func(q2, k2, v2, attn_mask=mask)
from ffpa_attn_tpu.functional import normalize_attn_mask
bias = normalize_attn_mask(mask, 1, 4, nq, nkv)
o2_ref = reference_attention(q2, k2, v2, bias, is_causal=False, scale=1.0 / d2 ** 0.5)
print("D768 cross mask fwd err:", err(o2, o2_ref))

# 3. varlen
tq = 1024
cu = jnp.array([0, 200, 800, 1024], jnp.int32)
qv = jax.random.normal(key, (tq, 4, 320), jnp.bfloat16)
kv_ = jax.random.normal(jax.random.PRNGKey(5), (tq, 4, 320), jnp.bfloat16)
vv = jax.random.normal(jax.random.PRNGKey(6), (tq, 4, 320), jnp.bfloat16)
ov = ffpa_attn_varlen_func(qv, kv_, vv, cu, cu, 1024, 1024, causal=True)
print("varlen finite:", bool(jnp.all(jnp.isfinite(ov.astype(jnp.float32)))))
print("JUDGE CHECK DONE")
