"""Pinpoint where the speculative-loop program spends/wedges on chip:
trace -> lower -> compile -> execute, separately, with wall times.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_spec_stages.py [draft_layers]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ffpa_attn_tpu.models import ModelConfig, init_params
from ffpa_attn_tpu.models.generate import _prefill_jit, init_kv_cache
from ffpa_attn_tpu.models.speculative import _spec_loop

draft_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 0
import os
vocab = 32000
ML = int(os.environ.get("PROBE_ML", 1024 + 8 + 6))
GEN = int(os.environ.get("PROBE_GEN", 8))
K = 4
cfg = ModelConfig(
    vocab_size=vocab, d_model=1024, n_heads=8, n_kv_heads=4, n_layers=4,
    head_dim=512, max_seq_len=ML,
)
params = init_params(jax.random.PRNGKey(0), cfg)
prompt = jnp.asarray(
    np.random.default_rng(0).integers(0, vocab, (1, 1024)), jnp.int32
)

if draft_layers > 0:
    import dataclasses

    cfg_d = dataclasses.replace(cfg, n_layers=draft_layers)
    params_d = dict(params, layers=params["layers"][:draft_layers])
else:
    cfg_d, params_d = cfg, params

t0 = time.perf_counter()
cache = init_kv_cache(cfg, 1, ML)
logits, cache = _prefill_jit(params, prompt, cache, cfg)
jax.block_until_ready(logits)
print(f"prefill target {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
cache_d = init_kv_cache(cfg_d, 1, ML)
_, cache_d = _prefill_jit(params_d, prompt, cache_d, cfg_d)
jax.block_until_ready(cache_d[0]["k"])
print(f"prefill draft {time.perf_counter()-t0:.1f}s", flush=True)

first = jnp.argmax(logits, -1).astype(jnp.int32)
controls = (jnp.float32(0.0), jnp.int32(0), jnp.float32(1.0))
args = (
    params, params_d, cache, cache_d, first, 1024, jax.random.PRNGKey(0),
    controls,
)
kw = dict(cfg_t=cfg, cfg_d=cfg_d, k_spec=K, iters=GEN, sampled=False)

t0 = time.perf_counter()
lowered = _spec_loop.lower(*args, **kw)
print(f"trace+lower {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
out = compiled(*[a for a in args])
jax.block_until_ready(out[0])
print(
    f"execute {time.perf_counter()-t0:.1f}s iters={int(out[3])}", flush=True
)
