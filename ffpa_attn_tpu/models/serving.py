"""Continuous batching: mixed-length prefill via the varlen kernel.

The BASELINE.json north star ("continuous batching of mixed-length
prefills via the varlen kernel", SURVEY.md §5 long-context): prompts of
different lengths are packed into ONE [T, H, D] varlen attention call per
layer (no padding work — the tile scheduler skips cross-segment and
above-diagonal tiles), their KV is scattered into per-sequence cache
slots, and generation proceeds with the batched KV-cache decode step
(generate.decode_step).

This is deliberately a thin engine: batch shapes are static (B sequences,
cache length max_len), per-sequence prompt lengths are dynamic.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..interface import ffpa_attn_varlen_func
from .generate import decode_step, init_kv_cache
from .transformer import ModelConfig, _mlp, _rmsnorm, _rope


def pack_prompts(prompts: Sequence[jnp.ndarray], pad_to: int):
    """Pack 1-D token prompts into (packed [T], cu_seqlens [B+1]).

    ``pad_to`` fixes the packed length (static shape for jit); the tail is
    padding tokens (id 0) that the varlen kernel masks via segment ids.
    """
    lens = [int(p.shape[0]) for p in prompts]
    total = sum(lens)
    assert total <= pad_to, (total, pad_to)
    packed = jnp.concatenate(
        list(prompts) + [jnp.zeros((pad_to - total,), jnp.int32)]
    )
    cu = jnp.asarray([0] + list(jnp.cumsum(jnp.asarray(lens))), jnp.int32)
    return packed.astype(jnp.int32), cu


def prefill_packed(params, packed, cu_seqlens, max_seqlen: int,
                   cfg: ModelConfig, cache):
    """Mixed-length prefill: ONE varlen attention call per layer.

    Args:
      packed: [T] int32 packed prompt tokens (B segments + tail padding).
      cu_seqlens: [B+1] int32 segment offsets.
      max_seqlen: static bound on the longest prompt.
      cache: per-layer KV cache [B, Hkv, max_len, Dh] (from init_kv_cache).

    Returns (last_logits [B, vocab], cache) — logits at each sequence's
    final prompt token.
    """
    t = packed.shape[0]
    batch = cache[0]["k"].shape[0]
    dh = cfg.head_dim

    t_ids = jnp.arange(t, dtype=jnp.int32)
    seg = jnp.searchsorted(cu_seqlens[1:], t_ids, side="right").astype(jnp.int32)
    seg_c = jnp.clip(seg, 0, batch - 1)
    pos = t_ids - cu_seqlens[seg_c]
    valid = t_ids < cu_seqlens[-1]

    x = params["embed"][packed][None]  # [1, T, D]
    enable_gqa = cfg.n_heads != cfg.n_kv_heads
    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        bsz, n, _ = h.shape
        q = (h @ layer["wq"]).reshape(n, cfg.n_heads, dh)
        k = (h @ layer["wk"]).reshape(n, cfg.n_kv_heads, dh)
        v = (h @ layer["wv"]).reshape(n, cfg.n_kv_heads, dh)
        # Rope with per-SEGMENT positions (restart at each prompt).
        q = _rope(q.transpose(1, 0, 2)[None], pos)[0].transpose(1, 0, 2)
        k = _rope(k.transpose(1, 0, 2)[None], pos)[0].transpose(1, 0, 2)

        # Scatter this layer's K/V into the per-sequence cache slots;
        # padding rows get out-of-bounds batch indices and are DROPPED
        # (duplicate-index writes would otherwise race the real tokens).
        b_idx = jnp.where(valid, seg_c, batch)
        cache[li] = {
            "k": cache[li]["k"].at[b_idx, :, pos].set(k, mode="drop"),
            "v": cache[li]["v"].at[b_idx, :, pos].set(v, mode="drop"),
        }

        from .generate import _feature_kwargs

        o = ffpa_attn_varlen_func(
            q, k, v, cu_seqlens, cu_seqlens, max_seqlen, max_seqlen,
            causal=True, enable_gqa=enable_gqa,
            **_feature_kwargs(cfg, layer),
        )
        x = x + (o.reshape(n, cfg.n_heads * dh) @ layer["wo"])[None]
        h = _rmsnorm(x, layer["mlp_norm"])
        x = x + _mlp(layer, h)

    x = _rmsnorm(x[0], params["final_norm"])  # [T, D]
    last_rows = jnp.maximum(cu_seqlens[1:] - 1, 0)  # [B]
    return x[last_rows] @ params["embed"].T, cache


def serve_batch(
    params,
    prompts: Sequence[jnp.ndarray],
    steps: int,
    cfg: ModelConfig,
    max_len: int,
    pack_to: int | None = None,
):
    """Continuous-batching generation for B mixed-length prompts.

    One packed varlen prefill + ``steps`` batched decode steps. Returns
    tokens [B, steps].
    """
    batch = len(prompts)
    lens = jnp.asarray([p.shape[0] for p in prompts], jnp.int32)
    pack_to = pack_to or int(sum(int(p.shape[0]) for p in prompts))
    packed, cu = pack_prompts(prompts, pack_to)
    max_seqlen = int(lens.max())

    # Shared-row cache layout for generation: prompts are ragged, but after
    # prefill every sequence advances in LOCKSTEP, so generated token t of
    # EVERY sequence lands at cache row ``base + t`` (base = longest
    # prompt, a static int). The per-step cache write becomes ONE
    # dynamic_update_slice with a shared scalar index — no per-sequence
    # scatter (the vmapped-DUS predecessor was scatter-bound: 100 tok/s at
    # B=4 vs 653 single-stream). Raggedness lives entirely in the
    # attention mask; RoPE carries each token's TRUE position
    # (lens[b] + t), so attention math is unaffected by the row remap.
    base = max_seqlen
    # Highest row ever written is base + steps - 2 (the scan runs steps-1
    # iterations; the final sampled token is returned, never cached), so a
    # cache sized max_len = base + steps - 1 is exactly sufficient. This
    # guard must stay: dynamic_update_slice clamps out-of-bounds starts and
    # would silently corrupt row max_len - 1 instead of failing.
    assert base + steps - 1 <= max_len, (base, steps, max_len)
    # ONE program for alloc + prefill + first token: an eager prefill pays
    # per-op dispatch (50-70 ms/op over the remote tunnel, ~40+ ops for a
    # 4-layer model = seconds of pure launch overhead — the round-4
    # serving probe's 5.9 s step-count-independent floor,
    # tools/r4_logs/21.probe-serving.log).
    tok, cache = _prefill_packed_jit(
        params, packed, cu, batch, cfg, max_seqlen, max_len
    )

    if steps == 1:
        return tok[:, None]
    # Batched ragged decode: ONE scanned decode-step program (mirrors
    # generate._decode_loop_jit) — per-token Python dispatch would bound
    # continuous-batching throughput by launch overhead, not the kernel.
    rest = _batched_decode_loop_jit(
        params, cache, lens, tok, cfg, steps - 1, base
    )
    return jnp.concatenate([tok[:, None], rest], axis=1)  # [B, steps]


@functools.partial(
    jax.jit, static_argnames=("batch", "cfg", "max_seqlen", "max_len")
)
def _prefill_packed_jit(params, packed, cu, batch: int, cfg: ModelConfig,
                 max_seqlen: int, max_len: int):
    """Cache alloc + packed varlen prefill + greedy first token as ONE
    compiled program (serving's fixed cost is one dispatch, not ~10/layer)."""
    cache = init_kv_cache(cfg, batch, max_len)
    logits, cache = prefill_packed(params, packed, cu, max_seqlen, cfg, cache)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


@functools.partial(jax.jit, static_argnames=("cfg", "steps", "base"))
def _batched_decode_loop_jit(params, cache, lens, first, cfg: ModelConfig,
                             steps: int, base: int):
    """``steps`` ragged decode steps under one ``lax.scan`` (all sequences
    share the write row ``base + t``; each attends its own valid set)."""

    def body(carry, _):
        cache, t, tok = carry
        logits, cache = _batched_decode_step(
            params, cache, lens, t, tok, cfg, base
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (cache, t + 1, nxt), nxt

    (_, _, _), toks = jax.lax.scan(
        body, (cache, jnp.int32(0), first), None, length=steps
    )
    return jnp.moveaxis(toks, 0, 1)  # [B, steps]


def _token_block(params, token, cfg: ModelConfig, positions, attend):
    """The per-token transformer stack shared by every decode flavor:
    embed -> [norm, QKV, RoPE at ``positions``, attend(li, q, k, v) -> o,
    residual, MLP] x layers -> final norm -> logits. ``attend`` owns the
    cache write + attention call (shared-row dense vs paged pools)."""
    b = token.shape[0]
    dh = cfg.head_dim
    x = params["embed"][token][:, None]  # [B, 1, D]
    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        q = (h @ layer["wq"]).reshape(b, 1, cfg.n_heads, dh).transpose(0, 2, 1, 3)
        k = (h @ layer["wk"]).reshape(b, 1, cfg.n_kv_heads, dh).transpose(0, 2, 1, 3)
        v = (h @ layer["wv"]).reshape(b, 1, cfg.n_kv_heads, dh).transpose(0, 2, 1, 3)
        q = _rope_at(q, positions)
        k = _rope_at(k, positions)
        o = attend(li, q, k, v)
        x = x + o.transpose(0, 2, 1, 3).reshape(b, 1, -1) @ layer["wo"]
        h = _rmsnorm(x, layer["mlp_norm"])
        x = x + _mlp(layer, h)
    x = _rmsnorm(x[:, -1], params["final_norm"])
    return x @ params["embed"].T


def _batched_decode_step(params, cache, lens, t, token, cfg: ModelConfig,
                         base: int):
    """One decode step for a ragged batch at shared step index ``t``.

    Sequence b's token has true position ``lens[b] + t`` (RoPE) and is
    cached at shared row ``base + t``. Valid attention columns are the
    prompt rows ``[0, lens[b])`` plus the generated rows
    ``[base, base + t]``; the gap ``[lens[b], base)`` is masked out.
    """
    from ..ops.reference import DEFAULT_MASK_VALUE

    b = token.shape[0]
    max_len = cache[0]["k"].shape[2]
    positions = lens + t  # [B] true token positions (RoPE)
    write_row = base + t  # shared cache row (traced scalar)
    cols = jnp.arange(max_len)[None, :]
    prompt_ok = cols < lens[:, None]
    gen_ok = (cols >= base) & (cols <= write_row)
    if cfg.sliding_window > 0:
        # Window over TRUE positions: prompt row c sits at position c;
        # generated row c sits at position lens[b] + (c - base). Keep only
        # rows within the last ``sliding_window`` tokens of positions[b].
        w = cfg.sliding_window
        prompt_ok = prompt_ok & (cols >= positions[:, None] - w)
        gen_ok = gen_ok & (cols >= base + t - w)
    valid = prompt_ok | gen_ok  # [B, max_len]
    bias = jnp.where(valid, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
    bias = bias[:, None, None, :]  # [B, 1, 1, max_len]
    enable_gqa = cfg.n_heads != cfg.n_kv_heads

    def attend(li, q, k, v):
        # One whole-batch cache write at the shared row.
        k_cache = jax.lax.dynamic_update_slice(
            cache[li]["k"], k, (0, 0, write_row, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            cache[li]["v"], v, (0, 0, write_row, 0)
        )
        cache[li] = {"k": k_cache, "v": v_cache}
        from ..interface import ffpa_attn_func
        from .generate import _feature_kwargs

        return ffpa_attn_func(
            q, k_cache, v_cache, attn_mask=bias, enable_gqa=enable_gqa,
            **_feature_kwargs(cfg, params["layers"][li], window=False),
        )

    return _token_block(params, token, cfg, positions, attend), cache


def _rope_at(x, positions):
    """Rope for [B, H, 1, Dh] at per-batch positions [B]."""
    outs = _rope(
        x.transpose(2, 1, 0, 3)[0][None],  # [1, H, B, Dh]
        positions,
    )  # [1, H, B, Dh] rotated with per-"row" positions
    return outs[0].transpose(1, 0, 2)[:, :, None, :]  # [B, H, 1, Dh]


def serve_batch_paged(
    params,
    prompts: Sequence[jnp.ndarray],
    steps: int,
    cfg: ModelConfig,
    max_len: int,
    page_size: int = 128,
    pack_to: int | None = None,
    quantized: bool = False,
):
    """Continuous batching over PAGED KV (ops/paged.py) — the vLLM-style
    serving memory: per-layer global page pools + per-sequence page
    tables, so a ragged batch streams bytes proportional to its true
    lengths (the dense shared-row cache streams ``max_len`` rows for every
    sequence) and appending never reallocates.

    Same contract as ``serve_batch``: one packed varlen prefill + ``steps``
    scanned paged-decode steps; returns greedy tokens [B, steps]. Unlike
    the shared-row layout, cache rows ARE true positions (prompt rows then
    generated rows, contiguous per sequence) — no row remap, no mask gap.
    """
    batch = len(prompts)
    lens = jnp.asarray([p.shape[0] for p in prompts], jnp.int32)
    pack_to = pack_to or int(sum(int(p.shape[0]) for p in prompts))
    packed, cu = pack_prompts(prompts, pack_to)
    max_seqlen = int(lens.max())
    # Highest token index ever cached is lens[b] + steps - 2 (the final
    # sampled token is returned, never cached).
    assert max_seqlen + steps - 1 <= max_len, (max_seqlen, steps, max_len)

    tok, caches = _prefill_paged_jit(
        params, packed, cu, lens, batch, cfg, max_seqlen, max_len,
        page_size, quantized,
    )
    if steps == 1:
        return tok[:, None]
    rest = _paged_decode_loop_jit(params, caches, tok, cfg, steps - 1)
    return jnp.concatenate([tok[:, None], rest], axis=1)  # [B, steps]


@functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "cfg", "max_seqlen", "max_len", "page_size", "quantized"
    ),
)
def _prefill_paged_jit(params, packed, cu, lens, batch: int, cfg: ModelConfig,
                       max_seqlen: int, max_len: int, page_size: int,
                       quantized: bool):
    """Dense prefill + per-layer page-pool fill + first token as ONE
    compiled program (same dispatch-amortization as _prefill_packed_jit)."""
    from ..ops.paged import PagedKVCache, fill_from_prefill

    dense = init_kv_cache(cfg, batch, max_seqlen)
    logits, dense = prefill_packed(params, packed, cu, max_seqlen, cfg, dense)
    caches = [
        fill_from_prefill(
            PagedKVCache.alloc(
                batch, max_len, cfg.n_kv_heads, cfg.head_dim, page_size,
                dtype=dense[li]["k"].dtype, quantized=quantized,
            ),
            dense[li]["k"], dense[li]["v"], lens,
        )
        for li in range(cfg.n_layers)
    ]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), caches


@functools.partial(jax.jit, static_argnames=("cfg", "steps"))
def _paged_decode_loop_jit(params, caches, first, cfg: ModelConfig, steps: int):
    def body(carry, _):
        caches, tok = carry
        logits, caches = _paged_decode_step(params, caches, tok, cfg)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (caches, nxt), nxt

    (_, _), toks = jax.lax.scan(body, (caches, first), None, length=steps)
    return jnp.moveaxis(toks, 0, 1)  # [B, steps]


def _paged_decode_step(params, caches, token, cfg: ModelConfig):
    """One decode step over per-layer paged pools. The new token's true
    position is ``caches[0].lens`` (rows are positions — contiguous per
    sequence); its K/V are appended BEFORE attention so the kernel's
    ``[0, lens)`` window includes it (standard decode semantics).
    sliding_window/attn_softcap/attn_sinks apply natively in the paged
    kernel (window = page-walk clamp: a long cache streams O(W) bytes)."""
    from ..ops.paged import append_token, paged_decode_attention

    positions = caches[0].lens  # [B] — position of the incoming token
    new_caches = []

    def attend(li, q, k, v):
        cache = append_token(caches[li], k, v)
        new_caches.append(cache)
        layer = params["layers"][li]
        return paged_decode_attention(
            q, cache, scale=cfg.head_dim**-0.5,
            softcap=cfg.attn_softcap,
            window_left=cfg.sliding_window if cfg.sliding_window > 0 else -1,
            sinks=layer["attn_sinks"] if cfg.attn_sinks else None,
        )

    logits = _token_block(params, token, cfg, positions, attend)
    return logits, new_caches
