"""Public API for FFPA-TPU attention.

``ffpa_attn_func`` mirrors the reference SDPA-compatible entry (reference:
src/ffpa_attn/ffpa_attn_interface.py:71-181): same signature, same error
taxonomy, same fallback policy — but the "native SDPA" target is
``jax.nn.dot_product_attention`` / the fp32 XLA composite, and the kernel
tier is Pallas/Mosaic.

``ffpa_attn_varlen_func`` mirrors the FlashAttention-style packed-THD varlen
entry (ffpa_attn_interface.py:184-271), implemented TPU-natively with
segment-ID masking (ops/varlen.py) instead of cu_seqlens pointer chasing.

``patch_dot_product_attention`` is the analog of the reference's
``F.scaled_dot_product_attention = ffpa_attn_func`` monkey-patch pattern
(reference README.md:45-51) for ``jax.nn.dot_product_attention``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .functional import FFPAAttnMeta
from .logger import init_logger
from .ops.attention import apply_attention

logger = init_logger(__name__)


def _sdpa_fallback(
    query, key, value, attn_mask, dropout_p, is_causal, scale, enable_gqa,
    dropout_seed=0, softcap=0.0, window_size=(-1, -1), alibi_slopes=None,
    sinks=None,
):
    """XLA-composite SDPA used for fallback shapes.

    The analog of the reference's direct ``torch._C._nn.scaled_dot_product_attention``
    call (ffpa_attn_interface.py:157-168: bypasses any monkey-patch to avoid
    recursion — here we inline the composite rather than calling
    ``jax.nn.dot_product_attention`` for exactly the same reason).
    """
    from .functional import normalize_attn_mask
    from .ops.reference import expand_kv_heads, reference_attention

    b, hq, nq, _ = query.shape
    nkv = key.shape[2]
    bias = None
    if attn_mask is not None:
        bias = normalize_attn_mask(attn_mask, b, hq, nq, nkv)
    k = expand_kv_heads(key, hq) if enable_gqa else key
    v = expand_kv_heads(value, hq) if enable_gqa else value
    if k.shape[1] != hq:
        raise ValueError(
            f"num_heads mismatch (q={hq}, kv={k.shape[1]}) requires "
            "enable_gqa=True"
        )
    return reference_attention(
        query,
        k,
        v,
        bias,
        is_causal=is_causal,
        scale=scale,
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        softcap=softcap or 0.0,
        window=tuple(window_size),
        alibi_slopes=alibi_slopes,
        sinks=sinks,
    )


def ffpa_attn_func(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    is_causal: bool = False,
    scale: Optional[float] = None,
    enable_gqa: bool = False,
    **kwargs,
) -> jnp.ndarray:
    """FFPA: exact attention for large head dims (D > 256) on TPU.

    Signature aligned with ``torch.nn.functional.scaled_dot_product_attention``
    and the reference ``ffpa_attn_func`` (ffpa_attn_interface.py:71-181).

    Args:
      query: ``[B, Nh_q, Nq, D]`` fp16/bf16.
      key: ``[B, Nh_kv, Nkv, D]``; ``Nh_q % Nh_kv == 0`` under GQA.
      value: ``[B, Nh_kv, Nkv, Dv]``.
      attn_mask: bool (True participates) or additive float mask
        broadcastable to ``[B, Nh_q, Nq, Nkv]``.
      dropout_p: attention dropout in [0, 1). Deterministic hash RNG; pass
        ``dropout_seed=<int or traced scalar>`` in kwargs to vary it.
      is_causal: tail-aligned causal (row m attends cols <= m + Nkv - Nq;
        requires Nkv >= Nq).
      scale: defaults to 1/sqrt(D).
      enable_gqa: opt into GQA/MQA semantics.
      **kwargs: ``backend`` / ``forward_backend`` / ``backward_backend``
        (str or Backend instance), ``dropout_seed``, plus the extension
        features the GPU reference rejects (cute/__init__.py:65-125) but
        FFPA-TPU implements natively:

        * ``softcap`` (float, 0 = off): logit soft-capping
          ``s = cap * tanh(s / cap)`` applied to the scaled scores before
          bias and masking (Gemma-2-style; FlashAttention ``softcap``).
        * ``window_size`` ((left, right) ints, -1 = unbounded): sliding-
          window attention around the tail-aligned diagonal — row at
          position p attends cols in ``[p - left, p + right]``. Composes
          with ``is_causal`` (right clamps to 0). Out-of-band tiles are
          skipped in compute AND bandwidth, so cost is O(N·W).
        * ``alibi_slopes`` ([Hq] or [B, Hq] fp32): ALiBi position bias
          ``-slope * |p - col|`` computed in-kernel (no N^2 bias tensor).
        * ``sinks`` ([Hq] fp32): learnable per-head attention-sink logits
          (gpt-oss-style) — extra softmax-denominator mass attending no
          value. DIFFERENTIABLE (gradient flows to the sink parameter);
          exact via an LSE rescale, zero kernel cost.

        Anything else raises TypeError.

    Returns:
      ``[B, Nh_q, Nq, Dv]`` attention output in input dtype.
    """
    dropout_seed = kwargs.pop("dropout_seed", 0)
    softcap = kwargs.pop("softcap", 0.0) or 0.0
    window_size = kwargs.pop("window_size", (-1, -1))
    if isinstance(window_size, int):
        window_size = (window_size, window_size)
    alibi_slopes = kwargs.pop("alibi_slopes", None)
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
    sinks = kwargs.pop("sinks", None)
    if sinks is not None:
        sinks = jnp.asarray(sinks, jnp.float32)
    meta = FFPAAttnMeta.from_kwargs(**kwargs)
    if meta.fallback(query, key, attn_mask, dropout_p):
        return _sdpa_fallback(
            query,
            key,
            value,
            attn_mask,
            dropout_p,
            is_causal,
            scale,
            enable_gqa,
            dropout_seed,
            softcap=softcap,
            window_size=window_size,
            alibi_slopes=alibi_slopes,
            sinks=sinks,
        )
    ameta, query, key, value, bias = meta.normalize(
        query, key, value, attn_mask, dropout_p, is_causal, scale, enable_gqa,
        softcap=softcap, window_size=window_size, alibi_slopes=alibi_slopes,
        sinks=sinks,
    )
    if query.dtype == jnp.float16:
        # TPU MXU/Mosaic has no native f16; the core computes in bf16 with
        # fp32 accumulation and casts back — and, to hold the 1e-2 fp16
        # contract, the backward splits P and the INCOMING f16 dO into
        # hi+lo bf16 pairs for the dV matmul (flash_bwd._dv_accumulate).
        # The f16 arrays cross the custom_vjp boundary untouched so the
        # cotangent reaches the backward unrounded. Documented deviation
        # from the GPU reference, which runs f16 natively.
        logger.warning_once(
            "float16 inputs: computing in bfloat16 on TPU (fp32 "
            "accumulation unchanged); outputs are cast back to float16"
        )
        return apply_attention(
            ameta, query, key, value, bias, dropout_seed, precise_pv=True,
            alibi_slopes=alibi_slopes, sinks=sinks,
        )
    return apply_attention(
        ameta, query, key, value, bias, dropout_seed,
        alibi_slopes=alibi_slopes, sinks=sinks,
    )


def ffpa_attn_varlen_func(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cu_seqlens_q: jnp.ndarray,
    cu_seqlens_k: Optional[jnp.ndarray],
    max_seqlen_q: int,
    max_seqlen_k: int,
    *,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    enable_gqa: bool = False,
    return_lse: bool = False,
    **kwargs,
):
    """Variable-length packed-THD attention (FlashAttention-style surface).

    See ops/varlen.py for the TPU-native segment-ID design. Mirrors
    reference ffpa_attn_varlen_func (ffpa_attn_interface.py:184-271)
    including the consolidated NotImplementedError for unsupported kwargs.
    """
    from .ops.varlen import ffpa_varlen_attention

    return ffpa_varlen_attention(
        q,
        k,
        v,
        cu_seqlens_q,
        cu_seqlens_k,
        max_seqlen_q,
        max_seqlen_k,
        dropout_p=dropout_p,
        softmax_scale=softmax_scale,
        causal=causal,
        enable_gqa=enable_gqa,
        return_lse=return_lse,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Monkey-patch analog
# ---------------------------------------------------------------------------

_ORIG_DPA = None
# Pristine reference captured at import, so the passthrough path can never
# recurse into the patched symbol.
_IMPORT_TIME_DPA = jax.nn.dot_product_attention


def _dpa_compatible_ffpa(query, key, value, bias=None, mask=None, *args, **kwargs):
    """Adapter exposing ffpa_attn_func under the
    ``jax.nn.dot_product_attention`` signature (B, N, H, D layout).

    Kwargs FFPA does not implement (``local_window_size``,
    ``query_seq_lengths``, ``key_value_seq_lengths``, non-default
    ``implementation``, ...) route to the saved original function — a
    patched user gets the stock semantics, never silently-wrong output.
    """
    is_causal = kwargs.pop("is_causal", False)
    scale = kwargs.pop("scale", None)
    implementation = kwargs.pop("implementation", None)
    # jax.nn.dot_product_attention's local_window_size maps 1:1 onto FFPA's
    # window_size for self-attention (same inclusive [p-left, p+right]
    # band; int means symmetric). Cross shapes keep the stock semantics.
    local_window = kwargs.pop("local_window_size", None)
    if local_window is not None and query.shape[1] != key.shape[1]:
        kwargs["local_window_size"] = local_window
        local_window = None
    passthrough = {k: v for k, v in kwargs.items() if v is not None}
    if args or passthrough or implementation not in (None, "xla"):
        original = _ORIG_DPA or _IMPORT_TIME_DPA
        if original is _dpa_compatible_ffpa:  # pragma: no cover - safety net
            original = _IMPORT_TIME_DPA
        logger.warning_once(
            "jax.nn.dot_product_attention called with kwargs FFPA does not "
            "implement (%s); routing to the original implementation",
            ", ".join(sorted(passthrough) or ["positional extras"]),
        )
        return original(
            query, key, value, bias, mask, *args,
            scale=scale, is_causal=is_causal, implementation=implementation,
            **kwargs,
        )
    # jax.nn.dot_product_attention uses [B, N, H, D]; FFPA uses [B, H, N, D].
    q = jnp.swapaxes(query, 1, 2)
    k = jnp.swapaxes(key, 1, 2)
    v = jnp.swapaxes(value, 1, 2)
    attn_mask = None
    if bias is not None and mask is not None:
        from .functional import normalize_attn_mask

        b_, hq = q.shape[0], q.shape[1]
        nq, nkv = q.shape[2], k.shape[2]
        attn_mask = normalize_attn_mask(bias, b_, hq, nq, nkv) + normalize_attn_mask(
            mask, b_, hq, nq, nkv
        )
    elif bias is not None:
        attn_mask = bias
    elif mask is not None:
        attn_mask = mask
    enable_gqa = q.shape[1] != k.shape[1]
    extra = {}
    if local_window is not None:
        extra["window_size"] = (
            (local_window, local_window)
            if isinstance(local_window, int)
            else tuple(local_window)
        )
    out = ffpa_attn_func(
        q,
        k,
        v,
        attn_mask=attn_mask,
        is_causal=is_causal,
        scale=scale,
        enable_gqa=enable_gqa,
        **extra,
    )
    return jnp.swapaxes(out, 1, 2)


def patch_dot_product_attention() -> None:
    """One-line integration: route ``jax.nn.dot_product_attention`` through
    FFPA with auto-fallback (reference README.md:45-51 monkey-patch)."""
    global _ORIG_DPA
    if _ORIG_DPA is None:
        _ORIG_DPA = jax.nn.dot_product_attention
    jax.nn.dot_product_attention = _dpa_compatible_ffpa
    logger.info_once("jax.nn.dot_product_attention patched with FFPA-TPU")


def unpatch_dot_product_attention() -> None:
    global _ORIG_DPA
    if _ORIG_DPA is not None:
        jax.nn.dot_product_attention = _ORIG_DPA
        _ORIG_DPA = None


__all__ = [
    "ffpa_attn_func",
    "ffpa_attn_varlen_func",
    "patch_dot_product_attention",
    "unpatch_dot_product_attention",
]
