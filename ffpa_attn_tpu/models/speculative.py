"""Speculative decoding: draft-propose, target-verify serving loop.

The serving pattern the nq <= 8 decode tier exists for (ops/decode.py
packs speculative tails into one Q row tile; ops/paged.py handles them over
page pools): a cheap DRAFT model proposes ``k_spec`` tokens one at a time,
then the TARGET model scores all ``k_spec + 1`` positions in ONE decode
call — turning k+1 memory-bound single-token target steps into one step
that streams the KV cache once.

Both modes are EXACT for any draft — the draft only changes how many
tokens each target call yields (acceptance rate):

* ``temperature == 0``: greedy speculation — the emitted sequence is the
  target's argmax trajectory.
* ``temperature > 0``: rejection-sampling speculation
  (:func:`speculative_accept` — accept draft t with probability
  ``min(1, p_t/p_d)``, resample the renormalized residual on rejection) —
  the emitted sequence is distributed exactly as target sampling under
  the same temperature/top_k/top_p controls.

This module implements the jit-able loop:

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
from .generate import _feature_kwargs, _project_qkv, init_kv_cache
from .transformer import ModelConfig, _mlp, _rmsnorm


def speculative_accept(key, p_target, p_draft, drafts):
    """Rejection-sampling acceptance (Leviathan et al. / DeepMind 2023).

    Args:
      key: PRNG key.
      p_target: [k, vocab] target probabilities at the k draft positions.
      p_draft: [k, vocab] draft probabilities at the same positions.
      drafts: [k] int32 proposed tokens.

    Returns (n_acc, next_token):
      ``n_acc`` — accepted prefix length in [0, k]; draft t is accepted
      with probability ``min(1, p_t[d_t] / p_d[d_t])``.
      ``next_token`` — when ``n_acc < k``: a sample from the residual
      ``max(0, p_t - p_d)`` (renormalized) at the first rejected position;
      when everything was accepted the caller samples the bonus position
      itself. The emitted sequence is then distributed EXACTLY as target
      sampling, for any draft.
    """
    k, vocab = p_target.shape
    key_u, key_r = jax.random.split(key)
    ids = jnp.arange(k)
    pt_d = p_target[ids, drafts]
    pd_d = jnp.maximum(p_draft[ids, drafts], 1e-30)
    u = jax.random.uniform(key_u, (k,))
    accept = u < jnp.minimum(1.0, pt_d / pd_d)
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
    # Residual distribution at the FIRST rejected position (n_acc clamps
    # to k-1 for indexing; unused when n_acc == k).
    j = jnp.minimum(n_acc, k - 1)
    resid = jnp.maximum(p_target[j] - p_draft[j], 0.0)
    resid_mass = jnp.sum(resid)
    # Degenerate p_t <= p_d everywhere (mass 0) cannot coincide with a
    # rejection unless numerics collude; fall back to the target dist.
    resid = jnp.where(resid_mass > 0.0, resid / resid_mass, p_target[j])
    next_token = jax.random.categorical(key_r, jnp.log(resid + 1e-30))
    return n_acc, next_token.astype(jnp.int32)


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
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "k_spec", "iters", "sampled"),
)
def _spec_loop(
    params_t, params_d, cache_t, cache_d, first, start, key, controls,
    cfg_t: ModelConfig, cfg_d: ModelConfig, k_spec: int, iters: int,
    sampled: bool = False,
):
    from .generate import decode_step
    from .sampling import filter_logits

    temperature, top_k, top_p = controls
    b = first.shape[0]
    buf = jnp.zeros((b, iters * (k_spec + 1)), jnp.int32)

    def probs(logits):
        return jax.nn.softmax(
            filter_logits(
                logits, temperature=temperature, top_k=top_k, top_p=top_p
            ),
            axis=-1,
        )

    def outer(carry):
        cache_t, cache_d, pos, tok, key_, buf, count, accepted, n_iter = carry
        key_, k_draft, k_acc, k_bonus = jax.random.split(key_, 4)

        # Draft proposes k_spec tokens (its cache rides along). One EXTRA
        # step (k_spec + 1 total) exists purely to write the LAST draft's
        # K/V into the draft cache: on full acceptance the next iteration
        # resumes past that position and would otherwise attend a
        # permanent zero row — silently degrading acceptance in exactly
        # the high-acceptance regime. Its proposal is discarded.
        def draft_body(dc, t):
            cache_d, cur, dk = dc
            logits, cache_d = decode_step(params_d, cache_d, pos + t, cur, cfg_d)
            dk, sub = jax.random.split(dk)
            if sampled:
                p = probs(logits)
                nxt = jax.random.categorical(
                    sub, jnp.log(p + 1e-30), axis=-1
                ).astype(jnp.int32)
            else:
                p = jnp.zeros_like(logits[..., :1])  # unused placeholder
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cache_d, nxt, dk), (nxt, p)

        (cache_d, _, _), (drafts, p_draft) = jax.lax.scan(
            draft_body, (cache_d, tok, k_draft),
            jnp.arange(k_spec + 1, dtype=jnp.int32),
        )
        drafts = jnp.moveaxis(drafts, 0, 1)[:, :k_spec]  # [B, k_spec]

        # Target scores tok + drafts in ONE (k_spec+1)-row decode call.
        block = jnp.concatenate([tok[:, None], drafts], axis=1)
        logits, cache_t = _verify_block(params_t, cache_t, pos, block, cfg_t)

        if sampled:
            # Rejection sampling (speculative_accept): exact target-
            # sampling distribution for any draft. Shared batch advance =
            # min acceptance; rows that accepted further emit their
            # (accepted) draft at the cut position, others their residual
            # sample / the bonus sample.
            p_t = probs(logits)  # [B, k+1, vocab]
            p_d = jnp.moveaxis(p_draft, 0, 1)[:, :k_spec]  # [B, k, vocab]
            acc_keys = jax.random.split(k_acc, b)
            n_acc_b, resid_b = jax.vmap(speculative_accept)(
                acc_keys, p_t[:, :k_spec], p_d, drafts
            )
            n_acc = jnp.min(n_acc_b)
            bonus_b = jax.vmap(
                lambda kk, pp: jax.random.categorical(kk, jnp.log(pp + 1e-30))
            )(jax.random.split(k_bonus, b), p_t[:, k_spec]).astype(jnp.int32)
            new_tok = jnp.where(
                n_acc_b > n_acc,  # row accepted past the cut: its draft
                drafts[:, jnp.minimum(n_acc, k_spec - 1)],
                jnp.where(n_acc == k_spec, bonus_b, resid_b),
            )
        else:
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]
            # Longest accepted prefix: drafts[t] must equal the target's
            # greedy continuation at position t (per batch row; the shared
            # loop advances by the batch MINIMUM so every row's emissions
            # are target-greedy — conservative but correct for ragged
            # acceptance).
            match = drafts == greedy[:, :k_spec]  # [B, k_spec]
            n_acc = jnp.min(
                jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
            )
            new_tok = greedy[jnp.arange(b), n_acc]

        # Emit drafts[:n_acc] then the per-row token at the cut position
        # (the "bonus" token when everything was accepted).
        emit = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1
        )
        emit = emit.at[:, n_acc].set(new_tok)
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
        return (
            cache_t, cache_d, pos + n_acc + 1, new_tok, key_,
            buf, count + n_acc + 1, accepted + n_acc, n_iter + 1,
        )

    # Fixed-trip scan with a live-gate cond, NOT lax.while_loop. The
    # semantics are while-like: each live iteration emits 1..k_spec+1
    # tokens, so a good draft is DONE after ~iters/(k+1) live iterations
    # and every remaining iteration takes the no-op cond branch (runtime
    # skips the untaken branch — microseconds, no kernel launches, no
    # cache copies via input/output aliasing). ``iters`` (>= steps)
    # bounds the worst case (0 acceptance). A genuine while_loop wedged
    # NONDETERMINISTICALLY on the remote TPU backend with this body
    # (round-5: identical programs alternated between 4 s and >28 min;
    # plain scans of the same decode/verify kernels never wedged) — the
    # bounded scan sidesteps that entire class while keeping the
    # fewer-target-calls property speculation exists for.
    init = (
        cache_t, cache_d, start, first, key, buf,
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )

    def step(carry, _):
        live = carry[6] < iters
        return jax.lax.cond(live, outer, lambda c: c, carry), ()

    out, _ = jax.lax.scan(step, init, None, length=iters)
    buf, count, accepted, n_iter = out[5], out[6], out[7], out[8]
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
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    key=None,
):
    """Speculative decoding: returns [B, steps] tokens.

    ``temperature == 0`` (default) is GREEDY speculation — the output is
    the target's exact greedy trajectory for any draft. ``temperature >
    0`` is REJECTION-SAMPLING speculation (:func:`speculative_accept`):
    the output is distributed exactly as target sampling with the same
    temperature/top_k/top_p controls, again for any draft.

    ``max_len`` must leave ``steps + k_spec + 1`` rows of headroom past the
    prompt (the last verify block writes up to k_spec+1 rows beyond the
    final emitted position). ``k_spec <= 7`` so the verify tail (k_spec+1
    rows) stays on the decode fast path.
    """
    assert 1 <= k_spec <= 7, k_spec
    b, n = prompt.shape
    assert max_len >= n + steps + k_spec + 1, (max_len, n, steps, k_spec)
    if key is None:
        key = jax.random.PRNGKey(0)
    cache_t = init_kv_cache(cfg_target, b, max_len)
    cache_d = init_kv_cache(cfg_draft, b, max_len)
    # Jitted prefills: the eager layer loop pays per-op remote dispatch
    # (50-70 ms/op over the tunnel) — two eager prefills were ~9 s of pure
    # launch overhead, the whole gap behind the round-4 "8.6 tok/s"
    # speculative row (tools/r4_logs/21.probe-serving.log constant term).
    from .generate import _prefill_jit

    logits_t, cache_t = _prefill_jit(params_target, prompt, cache_t, cfg_target)
    _, cache_d = _prefill_jit(params_draft, prompt, cache_d, cfg_draft)
    from .sampling import sample_logits

    sampled = float(temperature) > 0.0
    key, sub = jax.random.split(key)
    first = sample_logits(
        logits_t, sub, temperature=temperature, top_k=top_k, top_p=top_p,
        sampled=sampled,
    )

    # Worst case every iteration accepts 0 drafts -> 1 token; ``steps``
    # iterations always suffice.
    controls = (
        jnp.float32(temperature), jnp.int32(top_k), jnp.float32(top_p)
    )
    buf, count, accepted, n_iter = _spec_loop(
        params_target, params_draft, cache_t, cache_d, first,
        n, key, controls, cfg_target, cfg_draft, k_spec, steps,
        sampled=sampled,
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
