"""Greedy speculative decoding: draft-propose, target-verify serving loop.

The serving pattern the nq <= 8 decode tier exists for (ops/decode.py
packs speculative tails into one Q row tile; ops/paged.py handles them over
page pools): a cheap DRAFT model proposes ``k_spec`` tokens one at a time,
then the TARGET model scores all ``k_spec + 1`` positions in ONE decode
call — turning k+1 memory-bound single-token target steps into one step
that streams the KV cache once.

Greedy (argmax) speculative decoding is exact: the emitted sequence is a
greedy trajectory of the TARGET model regardless of draft quality — the
draft only changes how many tokens each target call yields (acceptance
rate). This module implements the jit-able loop:

* the verification block teacher-forces the (k+1)-token tail through the
  target with a per-row validity mask over the cache (row t attends
  positions <= pos + t; a model sliding window refines it), so the
  attention goes through the SAME speculative decode kernel the bench
  exercises;
* rejected rows leave garbage K/V behind — harmless by construction:
  position p is only ever attended after some query reaches pos >= p, and
  every position is (re)written by the token that actually occupies it
  before that happens;
* acceptance length is data-dependent; the scan uses masked buffer writes
  (the emit count rides the carry) so the whole loop stays one compiled
  program.

Reference relation: the reference has no serving loop at all (stateless
kernel library); this composes FFPA-TPU's decode tier into the standard
production serving optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.reference import DEFAULT_MASK_VALUE
from .generate import _feature_kwargs, _project_qkv, init_kv_cache, prefill
from .transformer import ModelConfig, _mlp, _rmsnorm


def _verify_block(params, cache, pos, toks, cfg: ModelConfig):
    """Teacher-force ``toks`` [B, m] (m <= 8) at positions pos..pos+m-1.

    Writes their K/V into the cache (contiguous rows) and returns
    (logits [B, m, vocab], cache). Row t's attention sees positions
    <= pos + t (within the model's sliding window, if any).
    """
    b, m = toks.shape
    x = params["embed"][toks]  # [B, m, D]
    positions = pos + jnp.arange(m, dtype=jnp.int32)
    max_len = cache[0]["k"].shape[2]
    cols = jnp.arange(max_len)[None, :]
    rows = positions[:, None]
    valid = cols <= rows
    if cfg.sliding_window > 0:
        valid = valid & (cols >= rows - cfg.sliding_window)
    bias = jnp.where(valid, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
    enable_gqa = cfg.n_heads != cfg.n_kv_heads
    from ..interface import ffpa_attn_func

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
        x = x + o.transpose(0, 2, 1, 3).reshape(b, m, -1) @ layer["wo"]
        h = _rmsnorm(x, layer["mlp_norm"])
        x = x + _mlp(layer, h)
    x = _rmsnorm(x, params["final_norm"])
    return x @ params["embed"].T, cache


@functools.partial(
    jax.jit, static_argnames=("cfg_t", "cfg_d", "k_spec", "iters")
)
def _spec_loop(
    params_t, params_d, cache_t, cache_d, first, start,
    cfg_t: ModelConfig, cfg_d: ModelConfig, k_spec: int, iters: int,
):
    from .generate import decode_step

    b = first.shape[0]
    buf = jnp.zeros((b, iters * (k_spec + 1)), jnp.int32)

    def outer(carry):
        cache_t, cache_d, pos, tok, buf, count, accepted, n_iter = carry

        # Draft proposes k_spec tokens greedily (its cache rides along).
        # One EXTRA step (k_spec + 1 total) exists purely to write the
        # LAST draft's K/V into the draft cache: on full acceptance the
        # next iteration resumes past that position and would otherwise
        # attend a permanent zero row — silently degrading acceptance in
        # exactly the high-acceptance regime. Its proposal is discarded.
        def draft_body(dc, t):
            cache_d, cur = dc
            logits, cache_d = decode_step(params_d, cache_d, pos + t, cur, cfg_d)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cache_d, nxt), nxt

        (cache_d, _), drafts = jax.lax.scan(
            draft_body, (cache_d, tok),
            jnp.arange(k_spec + 1, dtype=jnp.int32),
        )
        drafts = jnp.moveaxis(drafts, 0, 1)[:, :k_spec]  # [B, k_spec]

        # Target scores tok + drafts in ONE (k_spec+1)-row decode call.
        block = jnp.concatenate([tok[:, None], drafts], axis=1)
        logits, cache_t = _verify_block(params_t, cache_t, pos, block, cfg_t)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]

        # Longest accepted prefix: drafts[t] must equal the target's greedy
        # continuation at position t (per batch row; the shared loop
        # advances by the batch MINIMUM so every row's emissions are
        # target-greedy — conservative but correct for ragged acceptance).
        match = drafts == greedy[:, :k_spec]  # [B, k_spec]
        n_acc = jnp.min(
            jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        )

        # Emit drafts[:n_acc] then the target's own token at the first
        # non-accepted position (the "bonus" token when all accepted).
        emit = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1
        )
        emit = emit.at[:, n_acc].set(greedy[jnp.arange(b), n_acc])
        for t in range(k_spec + 1):
            live = t <= n_acc
            buf = jax.lax.cond(
                live,
                lambda bu: jax.lax.dynamic_update_slice(
                    bu, emit[:, t][:, None], (0, count + t)
                ),
                lambda bu: bu,
                buf,
            )
        new_tok = greedy[jnp.arange(b), n_acc]
        return (
            cache_t, cache_d, pos + n_acc + 1, new_tok,
            buf, count + n_acc + 1, accepted + n_acc, n_iter + 1,
        )

    # while_loop, not a fixed scan: each iteration emits 1..k_spec+1
    # tokens, so a good draft finishes in ~iters/(k+1) iterations — the
    # whole point of speculation is to NOT run one target step per token.
    # ``iters`` (>= steps) bounds the worst case (0 acceptance).
    init = (
        cache_t, cache_d, start, first, buf,
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    out = jax.lax.while_loop(lambda c: c[5] < iters, outer, init)
    cache_t, cache_d, pos, tok, buf, count, accepted, n_iter = out
    return buf, count, accepted, n_iter


def speculative_generate(
    params_target,
    params_draft,
    prompt,
    steps: int,
    cfg_target: ModelConfig,
    cfg_draft: ModelConfig,
    max_len: int,
    k_spec: int = 4,
    return_stats: bool = False,
):
    """Greedy speculative decoding: returns [B, steps] target-greedy tokens.

    ``max_len`` must leave ``steps + k_spec + 1`` rows of headroom past the
    prompt (the last verify block writes up to k_spec+1 rows beyond the
    final emitted position). ``k_spec <= 7`` so the verify tail (k_spec+1
    rows) stays on the decode fast path.
    """
    assert 1 <= k_spec <= 7, k_spec
    b, n = prompt.shape
    assert max_len >= n + steps + k_spec + 1, (max_len, n, steps, k_spec)
    cache_t = init_kv_cache(cfg_target, b, max_len)
    cache_d = init_kv_cache(cfg_draft, b, max_len)
    logits_t, cache_t = prefill(params_target, prompt, cfg_target, cache_t)
    _, cache_d = prefill(params_draft, prompt, cfg_draft, cache_d)
    first = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)

    # Worst case every iteration accepts 0 drafts -> 1 token; ``steps``
    # iterations always suffice.
    buf, count, accepted, n_iter = _spec_loop(
        params_target, params_draft, cache_t, cache_d, first,
        n, cfg_target, cfg_draft, k_spec, steps,
    )
    toks = jnp.concatenate([first[:, None], buf], axis=1)[:, :steps]
    if return_stats:
        return toks, {
            "emitted": int(count) + 1,
            "draft_accepted": int(accepted),
            "proposals": int(n_iter) * k_spec,
            "target_calls": int(n_iter),
        }
    return toks


__all__ = ["speculative_generate"]
