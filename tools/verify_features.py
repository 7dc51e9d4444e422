"""Public-surface verification drive: oracle parity, grads, decode/varlen
/GQA, error taxonomy + the feature tier (softcap/window/alibi). Runs on
whatever backend is attached: interpret mode on CPU, real Mosaic on the
chip (campaign step: catches lowering rejections interpret mode hides).
"""
import jax, jax.numpy as jnp, numpy as np
import ffpa_attn_tpu
from ffpa_attn_tpu import ffpa_attn_func, ffpa_attn_varlen_func
from ffpa_attn_tpu.ops.reference import reference_attention, expand_kv_heads

rng = np.random.default_rng(0)
def mk(*s, dt=jnp.bfloat16): return jnp.asarray(rng.standard_normal(s), dt)
ok = True
def chk(name, cond):
    global ok
    print(f"{name}: {'OK' if cond else 'FAIL'}"); ok = ok and cond

# 1. causal large-D fwd vs oracle
q,k,v = mk(1,4,1024,512), mk(1,4,1024,512), mk(1,4,1024,512)
out = ffpa_attn_func(q,k,v, is_causal=True)
ref = reference_attention(q,k,v, is_causal=True)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32))))
chk(f"causal D512 fwd err={err:.4f}", err < 5e-2)

# 2. grad finite + dtypes (with new features in the mix)
g = jax.grad(lambda q_: jnp.sum(ffpa_attn_func(
    q_,k,v, is_causal=True, softcap=30.0, window_size=(256,-1),
    alibi_slopes=jnp.asarray([.01,.02,.03,.04],jnp.float32)).astype(jnp.float32)))(q)
chk(f"grad finite dtype={g.dtype}", bool(jnp.all(jnp.isfinite(g.astype(jnp.float32)))) and g.dtype==q.dtype)

# 3. decode / varlen / gqa
qd = mk(1,4,1,512)
od = ffpa_attn_func(qd,k[:,:,:512],v[:,:,:512], is_causal=True)
chk("decode Nq=1 finite", bool(jnp.all(jnp.isfinite(od.astype(jnp.float32)))))
cu = jnp.asarray([0,300,700,1024],jnp.int32)
tq = mk(1024,4,512); tk = mk(1024,2,512); tv = mk(1024,2,512)
ov = ffpa_attn_varlen_func(tq,tk,tv,cu,cu,424,424, causal=True, enable_gqa=True)
chk("varlen gqa finite", bool(jnp.all(jnp.isfinite(ov.astype(jnp.float32)))))
kg,vg = mk(1,2,1024,512), mk(1,2,1024,512)
og = ffpa_attn_func(q,kg,vg, enable_gqa=True, window_size=(128,128))
rg = reference_attention(q, expand_kv_heads(kg,4), expand_kv_heads(vg,4), window=(128,128))
errg = float(jnp.max(jnp.abs(og.astype(jnp.float32)-rg.astype(jnp.float32))))
chk(f"gqa window fwd err={errg:.4f}", errg < 5e-2)

# 4. error taxonomy
try: ffpa_attn_func(q,k,v, bogus=1); chk("bogus kwarg TypeError", False)
except TypeError: chk("bogus kwarg TypeError", True)
try: ffpa_attn_func(mk(1,4,2048,512),k,v, is_causal=True); chk("causal Nkv<Nq ValueError", False)
except ValueError: chk("causal Nkv<Nq ValueError", True)
try: ffpa_attn_func(q,kg,vg); chk("head mismatch ValueError", False)
except ValueError: chk("head mismatch ValueError", True)
try: ffpa_attn_func(q,k,v, window_size=(0,-2)); chk("bad window ValueError", False)
except ValueError: chk("bad window ValueError", True)
qbig,kbig,vbig = mk(1,2,512,1088), mk(1,2,512,1088), mk(1,2,512,1088)
obig = ffpa_attn_func(qbig,kbig,vbig)
chk("D>1024 fallback finite", bool(jnp.all(jnp.isfinite(obig.astype(jnp.float32)))))

print("ALL OK" if ok else "FAILURES PRESENT")
raise SystemExit(0 if ok else 1)
