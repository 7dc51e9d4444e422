"""End-to-end verification of the public surface on the attached TPU."""
import jax, jax.numpy as jnp, numpy as np
import ffpa_attn_tpu
from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
from ffpa_attn_tpu.functional import PallasBackend
from ffpa_attn_tpu.ops.reference import expand_kv_heads, reference_attention

print(jax.devices(), flush=True)

def rel(a, b):
    a = np.asarray(jax.device_get(a), np.float32); b = np.asarray(jax.device_get(b), np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))

ks = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(ks[0], (1, 4, 2048, 512), jnp.bfloat16)
k = jax.random.normal(ks[1], (1, 4, 2048, 512), jnp.bfloat16)
v = jax.random.normal(ks[2], (1, 4, 2048, 512), jnp.bfloat16)
do = jax.random.normal(ks[3], (1, 4, 2048, 512), jnp.bfloat16)

# 1. causal fwd vs oracle
out = jax.jit(lambda a,b,c: ffpa_attn_func(a,b,c, is_causal=True))(q,k,v)
ref = reference_attention(q,k,v,None,is_causal=True,scale=512**-0.5)
print("fwd causal rel:", rel(out, ref), flush=True); assert rel(out, ref) < 5e-2

# 2. grads (S-resident default + forced handoff)
for tag, be in (("sres", PallasBackend(save_scores=True)), ("handoff", PallasBackend(save_scores=False))):
    def f(a,b,c):
        return ffpa_attn_func(a,b,c, is_causal=True, backward_backend=be)
    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = jax.jit(vjp)(do)
    _, rvjp = jax.vjp(lambda a,b,c: reference_attention(a,b,c,None,is_causal=True,scale=512**-0.5), q,k,v)
    w = rvjp(do.astype(jnp.float32) if False else do.astype(ref.dtype))
    errs = [rel(g, ww) for g, ww in zip((dq,dk,dv), w)]
    print(f"bwd {tag} rel dq/dk/dv:", errs, flush=True)
    assert all(e < 5e-2 for e in errs), (tag, errs)
    assert dq.dtype == jnp.bfloat16

# 3. decode GQA packed + varlen
qd = jax.random.normal(ks[0], (1, 16, 1, 512), jnp.bfloat16)
kd = jax.random.normal(ks[1], (1, 4, 4096, 512), jnp.bfloat16)
vd = jax.random.normal(ks[2], (1, 4, 4096, 512), jnp.bfloat16)
od = jax.jit(lambda a,b,c: ffpa_attn_func(a,b,c, enable_gqa=True))(qd,kd,vd)
rd = reference_attention(qd, expand_kv_heads(kd,16), expand_kv_heads(vd,16), None, scale=512**-0.5)
print("decode gqa rel:", rel(od, rd), flush=True); assert rel(od, rd) < 5e-2

q3 = jax.random.normal(ks[0], (1024, 4, 512), jnp.bfloat16)
k3 = jax.random.normal(ks[1], (1024, 4, 512), jnp.bfloat16)
v3 = jax.random.normal(ks[2], (1024, 4, 512), jnp.bfloat16)
cu = jnp.asarray([0, 300, 700, 1024], jnp.int32)
ov = ffpa_attn_varlen_func(q3, k3, v3, cu, cu, 512, 512, causal=True)
for s in range(3):
    lo, hi = int(cu[s]), int(cu[s+1])
    rr = reference_attention(q3[None, lo:hi].transpose(0,2,1,3), k3[None, lo:hi].transpose(0,2,1,3),
                             v3[None, lo:hi].transpose(0,2,1,3), None, is_causal=True, scale=512**-0.5)
    assert rel(ov[None, lo:hi].transpose(0,2,1,3), rr) < 5e-2, s
print("varlen ok", flush=True)

# 4. fp16 contract on-chip
qf, kf, vf, dof = (x.astype(jnp.float16) for x in (q, k, v, do))
outf, vjpf = jax.vjp(lambda a,b,c: ffpa_attn_func(a,b,c, is_causal=True), qf, kf, vf)
reff, rvjpf = jax.vjp(lambda a,b,c: reference_attention(a,b,c,None,is_causal=True,scale=512**-0.5), qf, kf, vf)
np.testing.assert_allclose(np.asarray(outf, np.float32), np.asarray(reff, np.float32), atol=1e-2, rtol=1e-2)
gf = vjpf(dof); wf = rvjpf(dof.astype(reff.dtype))
for n, a, b in zip(("dq","dk","dv"), gf, wf):
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-2, rtol=1e-2, err_msg=n)
print("fp16 contract ok", flush=True)

# 5. error taxonomy + patch passthrough
try:
    ffpa_attn_func(q, k, v, bogus=1); raise SystemExit("no TypeError")
except TypeError: pass
try:
    ffpa_attn_func(q[:, :, :256], k[:, :, :128], v[:, :, :128], is_causal=True); raise SystemExit("no ValueError")
except ValueError: pass
big = jax.random.normal(ks[0], (1, 2, 256, 1152), jnp.bfloat16)
ob = ffpa_attn_func(big, big, big)  # D>1024 silent fallback
assert bool(jnp.all(jnp.isfinite(ob.astype(jnp.float32))))
ffpa_attn_tpu.patch_dot_product_attention()
o_pt = jax.nn.dot_product_attention(jnp.swapaxes(q,1,2), jnp.swapaxes(k,1,2), jnp.swapaxes(v,1,2), is_causal=True)
assert rel(jnp.swapaxes(o_pt,1,2), ref) < 5e-2
o_win = jax.nn.dot_product_attention(jnp.swapaxes(q,1,2), jnp.swapaxes(k,1,2), jnp.swapaxes(v,1,2), is_causal=True, local_window_size=(16,0))
assert bool(jnp.all(jnp.isfinite(o_win.astype(jnp.float32))))
ffpa_attn_tpu.unpatch_dot_product_attention()
print("taxonomy + patch ok", flush=True)
print("ALL VERIFY CHECKS PASSED", flush=True)
