"""KV-cache autoregressive generation for the FFPA transformer.

The inference tier the reference leaves to its users (it benches a bare
decode case, reference cli/_bench.py decode Nq=1): prefill runs the causal
FFPA kernel over the prompt while writing the per-layer KV cache; each
decode step computes one token's q/k/v, updates the cache in place
(donated through ``lax.scan``) and attends over the valid prefix via the
decode split-stream kernel (ops/decode.py) with an additive validity bias.

Static shapes throughout: the cache is [B, Hkv, max_len, Dh]; the bias
masks positions beyond the current length, so XLA compiles one decode-step
program for the whole generation loop.
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp

from ..interface import ffpa_attn_func
from ..ops.reference import DEFAULT_MASK_VALUE
from .transformer import ModelConfig, _mlp, _rmsnorm, _rope


def _feature_kwargs(cfg: ModelConfig, layer, *, window: bool = True) -> dict:
    """ffpa_attn_func extras for the model's attention features.

    ``window=False`` omits window_size for call sites that realize the
    window through an explicit validity bias instead (decode over a cache
    longer than the current position, where tail-aligned bands don't map
    onto cache rows)."""
    extra = {}
    if window and cfg.sliding_window > 0:
        extra["window_size"] = (cfg.sliding_window, -1)
    if cfg.attn_softcap > 0.0:
        extra["softcap"] = cfg.attn_softcap
    if cfg.attn_sinks:
        extra["sinks"] = layer["attn_sinks"]
    return extra


def init_kv_cache(cfg: ModelConfig, batch: int, max_len: int):
    dtype = cfg.jnp_dtype
    return [
        {
            "k": jnp.zeros((batch, cfg.n_kv_heads, max_len, cfg.head_dim), dtype),
            "v": jnp.zeros((batch, cfg.n_kv_heads, max_len, cfg.head_dim), dtype),
        }
        for _ in range(cfg.n_layers)
    ]


def _project_qkv(layer, x, cfg: ModelConfig, positions):
    b, n, _ = x.shape
    dh = cfg.head_dim
    q = (x @ layer["wq"]).reshape(b, n, cfg.n_heads, dh).transpose(0, 2, 1, 3)
    k = (x @ layer["wk"]).reshape(b, n, cfg.n_kv_heads, dh).transpose(0, 2, 1, 3)
    v = (x @ layer["wv"]).reshape(b, n, cfg.n_kv_heads, dh).transpose(0, 2, 1, 3)
    q = _rope(q, positions)
    k = _rope(k, positions)
    return q, k, v


def prefill(params, tokens, cfg: ModelConfig, cache):
    """Run the prompt through the model, filling ``cache[:, :, :n]``.

    Returns (logits_last [B, vocab], cache).
    """
    b, n = tokens.shape
    x = params["embed"][tokens]
    positions = jnp.arange(n)
    enable_gqa = cfg.n_heads != cfg.n_kv_heads
    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _project_qkv(layer, h, cfg, positions)
        cache[li] = {
            "k": jax.lax.dynamic_update_slice(cache[li]["k"], k, (0, 0, 0, 0)),
            "v": jax.lax.dynamic_update_slice(cache[li]["v"], v, (0, 0, 0, 0)),
        }
        o = ffpa_attn_func(
            q, k, v, is_causal=True, enable_gqa=enable_gqa,
            **_feature_kwargs(cfg, layer),
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, n, cfg.n_heads * cfg.head_dim)
        x = x + o @ layer["wo"]
        h = _rmsnorm(x, layer["mlp_norm"])
        x = x + _mlp(layer, h)
    x = _rmsnorm(x[:, -1:], params["final_norm"])
    return (x @ params["embed"].T)[:, 0], cache


def decode_step(params, cache, pos, token, cfg: ModelConfig):
    """One autoregressive step.

    Args:
      cache: per-layer KV cache (updated functionally and returned).
      pos: int32 scalar — index the new token is written at.
      token: [B] int32.

    Returns (logits [B, vocab], cache).
    """
    b = token.shape[0]
    max_len = cache[0]["k"].shape[2]
    x = params["embed"][token][:, None]  # [B, 1, D]
    positions = jnp.full((1,), pos, jnp.int32)
    # Validity bias over the cache: positions <= pos participate. A model
    # sliding window further drops rows before pos - W (cache rows ARE
    # true positions here, so the band is a bias refinement).
    cache_rows = jnp.arange(max_len)
    valid = cache_rows <= pos
    if cfg.sliding_window > 0:
        valid = valid & (cache_rows >= pos - cfg.sliding_window)
    bias = jnp.where(valid, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
    bias = bias[None, None, None, :]  # [1, 1, 1, max_len]
    enable_gqa = cfg.n_heads != cfg.n_kv_heads

    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _project_qkv(layer, h, cfg, positions)
        k_cache = jax.lax.dynamic_update_slice(
            cache[li]["k"], k, (0, 0, pos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            cache[li]["v"], v, (0, 0, pos, 0)
        )
        cache[li] = {"k": k_cache, "v": v_cache}
        o = ffpa_attn_func(
            q, k_cache, v_cache, attn_mask=bias, enable_gqa=enable_gqa,
            **_feature_kwargs(cfg, layer, window=False),
        )
        x = x + o.transpose(0, 2, 1, 3).reshape(b, 1, -1) @ layer["wo"]
        h = _rmsnorm(x, layer["mlp_norm"])
        x = x + _mlp(layer, h)
    x = _rmsnorm(x[:, -1], params["final_norm"])
    return x @ params["embed"].T, cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prefill_jit(params, prompt, cache, cfg: ModelConfig):
    return prefill(params, prompt, cfg, cache)


@functools.partial(
    jax.jit, static_argnames=("cfg", "start", "steps", "sampled")
)
def _decode_loop_jit(
    params, cache, first, key, controls, cfg: ModelConfig, start: int,
    steps: int, sampled: bool = False,
):
    """``controls`` = (temperature, top_k, top_p) as TRACED scalars — one
    compiled loop serves every sampling setting; only the greedy/sampled
    branch is structural (static ``sampled``)."""
    from .sampling import sample_logits

    temperature, top_k, top_p = controls

    def body(carry, i):
        cache, tok, key_ = carry
        logits, cache = decode_step(params, cache, start + i, tok, cfg)
        key_, sub = jax.random.split(key_)
        nxt = sample_logits(
            logits, sub, temperature=temperature, top_k=top_k, top_p=top_p,
            sampled=sampled,
        )
        return (cache, nxt, key_), tok

    (_, _, _), toks = jax.lax.scan(
        body, (cache, first, key), jnp.arange(steps, dtype=jnp.int32)
    )
    return jnp.moveaxis(toks, 0, 1)  # [B, steps]


def generate(
    params,
    prompt: jnp.ndarray,
    steps: int,
    cfg: ModelConfig,
    max_len: Optional[int] = None,
    greedy: bool = True,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    key=None,
):
    """Autoregressive generation: prompt [B, Np] int32 -> tokens [B, steps].

    One prefill program + one scanned decode-step program, both cached
    across ``generate`` calls (module-level jits with static cfg/lengths).

    Sampling: the default (``temperature=0`` / ``greedy=True``) is argmax;
    a positive ``temperature`` samples with optional ``top_k`` / nucleus
    ``top_p`` filtering (models/sampling.py), seeded by ``key``
    (``PRNGKey(0)`` if omitted) — fully deterministic per (key, inputs).
    """
    b, np_ = prompt.shape
    max_len = max_len or (np_ + steps)
    cache = init_kv_cache(cfg, b, max_len)
    if not greedy and temperature <= 0.0:
        temperature = 1.0
    sampled = float(temperature) > 0.0
    if key is None:
        key = jax.random.PRNGKey(0)

    from .sampling import sample_logits

    logits, cache = _prefill_jit(params, prompt, cache, cfg)
    key, sub = jax.random.split(key)
    first = sample_logits(
        logits, sub, temperature=temperature, top_k=top_k, top_p=top_p,
        sampled=sampled,
    )
    controls = (
        jnp.float32(temperature), jnp.int32(top_k), jnp.float32(top_p)
    )
    return _decode_loop_jit(
        params, cache, first, key, controls, cfg, np_, steps,
        sampled=sampled,
    )
