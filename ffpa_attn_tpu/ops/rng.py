"""Deterministic, layout-independent attention-dropout RNG.

The reference achieves SDPA-bit-exact dropout by reserving Philox offsets so
that every logical ``[B, Hq, Nq, Nkv]`` score element maps to one fixed
Philox output, replayed identically in backward (reference:
src/ffpa_attn/functional.py:433-455, triton/_ffpa_fwd.py:81-123).

On TPU we re-derive the same *property* — one fixed uniform per logical
element, independent of kernel block shapes, replayable in backward — with a
counter-based integer hash built from pure ``uint32`` VPU arithmetic. This
works identically inside Pallas kernels, in the fp32 reference oracle, and in
interpret mode, so "parity" is defined against our own fp32 reference (the
documented deviation from CUDA-SDPA bitwise parity, SURVEY.md §7 hard part 3).

The hash is a murmur3-finalizer-based combine over ``(seed, b, h, i, j)``.
Keep rule: ``uniform(b,h,i,j) >= p`` keeps the element; kept elements are
scaled by ``1/(1-p)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_GOLDEN = 0x9E3779B9  # 2^32 / phi, the classic hash_combine constant.


def _u32(x) -> jnp.ndarray:
    if isinstance(x, int):
        return jnp.uint32(x & 0xFFFFFFFF)
    return jnp.asarray(x).astype(jnp.uint32)


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer (full avalanche)."""
    h = h ^ (h >> 16)
    h = h * _u32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _u32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _combine(state: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    """boost::hash_combine-style fold of one 32-bit word into the state."""
    return _fmix32(state ^ (value + _u32(_GOLDEN) + (state << 6) + (state >> 2)))


def uniform_for_scores(
    seed,
    batch_idx,
    head_idx,
    row_ids: jnp.ndarray,
    col_ids: jnp.ndarray,
) -> jnp.ndarray:
    """Uniform in [0, 1) for logical score elements ``[b, h, row, col]``.

    ``row_ids`` / ``col_ids`` are int32 arrays (broadcastable against each
    other) holding *global* Q-row / KV-col indices, so any kernel tiling
    reproduces the same per-element value. ``seed``/``batch_idx``/``head_idx``
    are scalars (Python ints or traced int32).
    """
    state = _fmix32(_u32(seed) ^ _u32(0x46465041))  # 'FFPA'
    state = _combine(state, _u32(batch_idx))
    state = _combine(state, _u32(head_idx))
    # Vector part: fold rows then cols elementwise.
    state = _combine(state, _u32(row_ids))
    state = _combine(state, _u32(col_ids))
    # Top 24 bits -> float32 uniform in [0, 1). Mosaic has no uint32->f32
    # cast; the 24-bit value fits int32, so hop through int32.
    return (state >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )


def dropout_keep_mask(
    seed,
    batch_idx,
    head_idx,
    row_ids: jnp.ndarray,
    col_ids: jnp.ndarray,
    dropout_p,
) -> jnp.ndarray:
    """Boolean keep mask with the contract ``keep <=> uniform >= p``."""
    u = uniform_for_scores(seed, batch_idx, head_idx, row_ids, col_ids)
    return u >= jnp.float32(dropout_p)


def make_row_col_ids(nq: int, nkv: int, row_offset=0, col_offset=0):
    """Global (row, col) index grids for a tile of shape (nq, nkv)."""
    rows = lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) + jnp.int32(row_offset)
    cols = lax.broadcasted_iota(jnp.int32, (nq, nkv), 1) + jnp.int32(col_offset)
    return rows, cols
