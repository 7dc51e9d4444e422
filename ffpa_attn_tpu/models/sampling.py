"""Token sampling for the generation/serving tiers.

Device-side categorical sampling with the standard serving controls —
temperature, top-k, nucleus (top-p) — as one jit-able function. Greedy
(argmax) is the ``temperature == 0`` limit, so every loop in this package
threads a single sampler instead of special-casing.

Filtering order follows the common serving convention (HF/vLLM):
temperature scales logits, then top-k keeps the k largest, then top-p
keeps the smallest prefix of the (sorted) distribution with cumulative
probability >= p; sampling is categorical over what survives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e30)


def filter_logits(
    logits,
    *,
    temperature=1.0,
    top_k=0,
    top_p=1.0,
):
    """Temperature-scale + top-k + nucleus-filter ``logits`` [..., vocab]
    (filtered-out entries get -1e30). ``softmax`` of the result is the
    sampling distribution — also what rejection-sampling speculative
    decoding needs as its target/draft probabilities.

    Every control may be a PYTHON scalar or a TRACED scalar: the filter
    arithmetic is written trace-friendly, so jitted serving loops can take
    the controls as operands instead of static arguments (one compiled
    program for all settings; only greedy-vs-sampled is structural). The
    best token always survives filtering — ``top_p <= 0`` collapses to
    argmax rather than masking everything, ``top_k <= 0`` disables top-k.
    """
    x = logits.astype(jnp.float32) / jnp.maximum(
        jnp.float32(temperature), 1e-6
    )
    vocab = x.shape[-1]
    sorted_x = jnp.sort(x, axis=-1)[..., ::-1]  # descending
    # top-k: keep logits >= the k-th largest; k <= 0 (or >= vocab) = off.
    eff_k = jnp.clip(jnp.where(top_k > 0, top_k, vocab), 1, vocab)
    kth = jnp.take_along_axis(
        sorted_x,
        jnp.broadcast_to(eff_k - 1, sorted_x.shape[:-1])[..., None],
        axis=-1,
    )
    x = jnp.where(x >= kth, x, _NEG)
    # nucleus: keep the smallest sorted prefix with cumulative mass >= p —
    # every logit whose prefix mass EXCLUDING itself is < p. The top-1
    # token always survives (index 0 forced True), so degenerate p <= 0
    # means argmax instead of an all-masked vocabulary.
    probs = jax.nn.softmax(sorted_x, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    cutoff = jnp.min(
        jnp.where(keep_sorted, sorted_x, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(x >= cutoff, x, _NEG)


def sample_logits(
    logits,
    key,
    *,
    temperature=1.0,
    top_k=0,
    top_p=1.0,
    sampled=None,
):
    """Sample token ids from ``logits`` [..., vocab] -> int32 [...].

    ``temperature <= 0`` means greedy argmax (key unused). ``top_k <= 0``
    disables the top-k filter; ``top_p >= 1`` disables nucleus filtering.
    The controls may be traced scalars; pass static ``sampled`` to pick
    the greedy/sampled branch when temperature itself is traced.
    """
    if sampled is None:
        sampled = float(temperature) > 0.0
    if not sampled:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = filter_logits(
        logits, temperature=temperature, top_k=top_k, top_p=top_p
    )
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


__all__ = ["sample_logits", "filter_logits"]
