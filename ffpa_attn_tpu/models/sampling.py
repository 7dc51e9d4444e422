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
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """Temperature-scale + top-k + nucleus-filter ``logits`` [..., vocab]
    (filtered-out entries get -1e30). ``softmax`` of the result is the
    sampling distribution — also what rejection-sampling speculative
    decoding needs as its target/draft probabilities."""
    x = logits.astype(jnp.float32) / jnp.float32(max(temperature, 1e-6))
    vocab = x.shape[-1]
    if top_k and 0 < top_k < vocab:
        kth = jnp.sort(x, axis=-1)[..., vocab - top_k][..., None]
        x = jnp.where(x >= kth, x, _NEG)
    if top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep every logit whose sorted-prefix cumulative mass (EXCLUDING
        # itself) is < p — the smallest nucleus covering p, always >= 1
        # token.
        keep_sorted = (cum - probs) < top_p
        cutoff = jnp.min(
            jnp.where(keep_sorted, sorted_x, jnp.inf), axis=-1, keepdims=True
        )
        x = jnp.where(x >= cutoff, x, _NEG)
    return x


def sample_logits(
    logits,
    key,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """Sample token ids from ``logits`` [..., vocab] -> int32 [...].

    ``temperature <= 0`` means greedy argmax (key unused). ``top_k <= 0``
    disables the top-k filter; ``top_p >= 1`` disables nucleus filtering.
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = filter_logits(
        logits, temperature=temperature, top_k=top_k, top_p=top_p
    )
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


__all__ = ["sample_logits", "filter_logits"]
