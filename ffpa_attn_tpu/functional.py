"""Dispatch, validation and backend configuration for FFPA-TPU.

TPU-native re-design of the reference dispatch layer (reference:
src/ffpa_attn/functional.py):

* ``Backend`` dataclasses — the user-facing knob surface
  (reference functional.py:154-430). The reference's four GPU backends
  (SDPA / CUDA / Triton / CuTeDSL) collapse on TPU into two real tiers:
  ``SDPABackend`` (XLA-fused reference einsum chain) and ``PallasBackend``
  (Mosaic kernels). GPU backend names are accepted as aliases so reference
  users can switch without edits.
* ``FFPAAttnMeta`` — kwarg parsing with unknown-key TypeError
  (reference functional.py:545-549), the fallback predicate
  (functional.py:591-639), input validation / normalization
  (functional.py:641-748) and boolean→additive mask normalization
  (functional.py:750-810).

There is no autograd Function here: gradients flow through
``jax.custom_vjp`` wired around the Pallas calls in ``ops/`` — everything is
jit/grad/vmap-traceable by construction (the analog of the reference's
``torch.library`` op + ``@torch._dynamo.disable`` machinery,
functional.py:1063-1082, which TPU does not need).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Union

import jax.numpy as jnp

from .env import ENV
from .logger import init_logger

logger = init_logger(__name__)

# Head dims the Pallas large-D path is designed for (reference supports
# 320..1024 and delegates D<=256 to flash-attn: functional.py:591-639).
MIN_LARGE_D = 257
MAX_LARGE_D = 1024

_SUPPORTED_DTYPES = (jnp.float16, jnp.bfloat16)


# ---------------------------------------------------------------------------
# Backend configuration dataclasses
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Backend:
    """Base backend config. ``role`` resolution mirrors reference
    functional.py:168-176: one config can serve as forward, backward or both.
    """

    name: str = "base"

    def validate(self) -> None:  # pragma: no cover - overridden
        pass


@dataclass(frozen=True)
class SDPABackend(Backend):
    """XLA-composite attention (the fp32-accumulated reference einsum chain).

    ``high_precision_grad`` mirrors reference SDPABackend(high_precision_grad)
    (functional.py:178-193): backward math upcast to fp32.
    """

    name: str = "sdpa"
    high_precision_grad: bool = True

    def validate(self) -> None:
        pass


@dataclass(frozen=True)
class PallasBackend(Backend):
    """Mosaic (Pallas) kernel tier — replaces the reference's CUDA, Triton
    and CuTeDSL backends (SURVEY.md §7 architecture mapping).

    Knobs map from reference TritonBackend/CuTeDSLBackend
    (functional.py:291-359):

    * ``autotune`` / ``autotune_mode`` — online block-shape search
      ('fast' buckets seqlens coarsely; 'max' searches a finer space).
    * ``block_q`` / ``block_kv`` / ``block_kv_dkdv`` / ``block_q_dq`` — manual
      block-shape overrides (None = persistent-config lookup, else defaults).
    * ``grad_kv_storage_dtype`` / ``grad_q_storage_dtype`` — dK/dV / dQ HBM
      storage dtype override ('f32' keeps fp32 accumulators in HBM,
      'bf16'/'f16' halve bandwidth; reference functional.py:291-335).
    """

    name: str = "pallas"
    autotune: bool = False
    autotune_mode: str = "fast"
    block_q: Optional[int] = None
    block_kv: Optional[int] = None
    block_kv_dkdv: Optional[int] = None
    block_q_dq: Optional[int] = None
    grad_kv_storage_dtype: Optional[str] = None
    grad_q_storage_dtype: Optional[str] = None
    # dS-handoff backward (flash_bwd.py): None = auto by HBM budget,
    # True/False = force. The handoff removes the dQ kernel's S/dP
    # recompute at the cost of one bf16 [B,Hq,Nq,Nkv] HBM buffer.
    ds_handoff: Optional[bool] = None
    # S-resident backward: the training-path forward additionally emits the
    # bf16 score matrix as a residual, and the backward drops its S
    # recompute entirely (4 matmul-equivalents instead of 5). None = auto
    # (bf16 inputs whose padded scores fit
    # ENV.scores_residual_limit_bytes), True/False = force.
    save_scores: Optional[bool] = None

    def validate(self) -> None:
        if self.autotune_mode not in ("fast", "max"):
            raise ValueError(
                f"autotune_mode must be 'fast' or 'max', got {self.autotune_mode!r}"
            )
        for attr in ("block_q", "block_kv", "block_kv_dkdv", "block_q_dq"):
            val = getattr(self, attr)
            if val is not None and (val <= 0 or val % 128 != 0):
                raise ValueError(
                    f"{attr} must be a positive multiple of 128 (TPU lane "
                    f"width), got {val}"
                )
        for attr in ("grad_kv_storage_dtype", "grad_q_storage_dtype"):
            val = getattr(self, attr)
            if val is not None and val not in ("f16", "bf16", "f32"):
                raise ValueError(
                    f"{attr} must be one of 'f16', 'bf16', 'f32', got {val!r}"
                )


# Accepted string names. GPU backend names alias to the Pallas tier so code
# written against the reference keeps working (with a one-time log).
_BACKEND_ALIASES = {
    "sdpa": SDPABackend,
    "pallas": PallasBackend,
    "mosaic": PallasBackend,
    # Reference-compat aliases (reference coercion map functional.py:401-422).
    "triton": PallasBackend,
    "cuda": PallasBackend,
    "cutedsl": PallasBackend,
}


def _coerce_backend(value: Union[str, Backend, None]) -> Optional[Backend]:
    if value is None or isinstance(value, Backend):
        if isinstance(value, Backend):
            value.validate()
        return value
    if isinstance(value, str):
        key = value.lower()
        if key not in _BACKEND_ALIASES:
            raise ValueError(
                f"unknown backend {value!r}; expected one of "
                f"{sorted(_BACKEND_ALIASES)}"
            )
        if key in ("triton", "cuda", "cutedsl"):
            logger.info_once(
                "backend '%s' is a GPU name; using the TPU Pallas tier", key
            )
        return _BACKEND_ALIASES[key]()
    raise TypeError(f"backend must be a str or Backend, got {type(value)!r}")


# ---------------------------------------------------------------------------
# Meta: kwargs, fallback predicate, normalization
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AttentionMeta:
    """Normalized attention call description handed to the kernel layer."""

    scale: float
    is_causal: bool
    dropout_p: float
    num_q_heads: int
    num_kv_heads: int
    enable_gqa: bool
    forward_backend: Backend = field(default_factory=PallasBackend)
    backward_backend: Backend = field(default_factory=PallasBackend)
    # Features the reference API rejects (cute/__init__.py:65-125),
    # implemented natively here: logit soft-capping (0 = off) and the
    # FlashAttention-style sliding-window band (-1 = unbounded side).
    softcap: float = 0.0
    window: tuple = (-1, -1)


@dataclass(frozen=True)
class FFPAAttnMeta:
    """Pre-normalization meta built from user kwargs.

    Mirrors reference FFPAAttnMeta (functional.py:508-843): kwargs are parsed
    first (so unknown keys raise TypeError before any tensor checks), then
    ``fallback`` decides SDPA short-circuit, then ``normalize`` validates and
    canonicalizes tensors.
    """

    forward_backend: Optional[Backend] = None
    backward_backend: Optional[Backend] = None
    backend_forced: bool = False

    _ALLOWED_KWARGS = ("backend", "forward_backend", "backward_backend")

    @classmethod
    def from_kwargs(cls, **kwargs: object) -> "FFPAAttnMeta":
        unknown = [k for k in kwargs if k not in cls._ALLOWED_KWARGS]
        if unknown:
            # Reference raises TypeError for unknown kwargs
            # (functional.py:545-549).
            raise TypeError(
                f"ffpa_attn_func() got unexpected keyword argument(s): "
                f"{', '.join(sorted(unknown))}; supported extension kwargs "
                f"are {list(cls._ALLOWED_KWARGS)}"
            )
        shared = _coerce_backend(kwargs.get("backend"))  # type: ignore[arg-type]
        fwd = _coerce_backend(kwargs.get("forward_backend"))  # type: ignore[arg-type]
        bwd = _coerce_backend(kwargs.get("backward_backend"))  # type: ignore[arg-type]
        forced = any(
            kwargs.get(k) is not None for k in cls._ALLOWED_KWARGS
        )
        return cls(
            forward_backend=fwd or shared,
            backward_backend=bwd or shared,
            backend_forced=forced,
        )

    # -- fallback predicate --------------------------------------------------

    def fallback(self, query, key, attn_mask, dropout_p: float) -> bool:
        """True when the call should short-circuit to the XLA SDPA composite.

        Re-derivation of reference fallback rules (functional.py:591-639)
        with TPU thresholds:

        * explicit sdpa forward backend — always
        * small head dim D<=256 (flash-attn territory; XLA/splash handles it)
          unless FFPA_TPU_ALLOW_SMALL_D
        * D > 1024 — beyond the designed range
        * tiny sequence lengths where a Mosaic launch can't win
        """
        if isinstance(self.forward_backend, SDPABackend):
            return True
        if query.ndim != 4 or key.ndim != 4:
            return False  # let normalize raise a precise error
        d = query.shape[-1]
        if d <= 256 and not ENV.allow_small_d():
            if self.backend_forced:
                logger.warning_once(
                    "head_dim %d <= 256: falling back to XLA SDPA despite "
                    "explicit backend (set FFPA_TPU_ALLOW_SMALL_D=1 to force "
                    "the Pallas path)",
                    d,
                )
            return True
        if d > MAX_LARGE_D:
            logger.warning_once(
                "head_dim %d > %d: falling back to XLA SDPA", d, MAX_LARGE_D
            )
            return True
        nq, nkv = query.shape[2], key.shape[2]
        if 8 < nq < ENV.min_seqlen_q() or nkv < ENV.min_seqlen_kv():
            # Nq<=8 goes to the decode kernel (incl. speculative decoding);
            # other tiny shapes are XLA's to fuse (reference analog:
            # 8<=Nq<512 → SDPA).
            return True
        return False

    # -- normalization -------------------------------------------------------

    def normalize(
        self,
        query,
        key,
        value,
        attn_mask,
        dropout_p: float,
        is_causal: bool,
        scale: Optional[float],
        enable_gqa: bool,
        softcap: float = 0.0,
        window_size=(-1, -1),
        alibi_slopes=None,
        sinks=None,
    ):
        """Validate and canonicalize inputs.

        Mirrors reference normalize_inputs (functional.py:641-748) +
        normalize_attn_mask (functional.py:750-810). Returns
        ``(meta, query, key, value, bias)`` with ``bias`` an additive fp32
        bias (or None) reshaped to 4-D with broadcast dims kept compact.
        ``softcap`` / ``window_size`` / ``alibi_slopes`` are the extension
        features (validated here, carried on the meta / passed alongside).
        """
        if not (0.0 <= dropout_p < 1.0):
            raise ValueError(f"dropout_p must be in [0, 1), got {dropout_p}")
        if softcap is None:
            softcap = 0.0
        if softcap < 0.0:
            raise ValueError(f"softcap must be >= 0, got {softcap}")
        try:
            wl, wr = int(window_size[0]), int(window_size[1])
        except (TypeError, IndexError):
            raise ValueError(
                f"window_size must be a (left, right) pair of ints, got "
                f"{window_size!r}"
            ) from None
        if wl < -1 or wr < -1:
            raise ValueError(
                f"window_size entries must be >= -1 (-1 = unbounded), got "
                f"({wl}, {wr})"
            )
        if query.dtype not in _SUPPORTED_DTYPES:
            raise TypeError(
                f"query dtype must be float16 or bfloat16, got {query.dtype}"
            )
        if key.dtype != query.dtype or value.dtype != query.dtype:
            raise TypeError(
                f"q/k/v dtypes must match, got {query.dtype}/{key.dtype}/"
                f"{value.dtype}"
            )
        for name, t in (("query", query), ("key", key), ("value", value)):
            if t.ndim != 4:
                raise ValueError(
                    f"{name} must be 4-D [B, H, N, D], got shape {t.shape}"
                )
        b, hq, nq, d = query.shape
        bk, hkv, nkv, dk = key.shape
        bv, hv, nv, dv = value.shape
        if bk != b or bv != b:
            raise ValueError(
                f"batch mismatch: q={b}, k={bk}, v={bv}"
            )
        if dk != d:
            raise ValueError(f"head_dim mismatch: q={d}, k={dk}")
        if hv != hkv or nv != nkv:
            raise ValueError(
                "key and value must share num_heads and seqlen, got "
                f"k=[{hkv},{nkv}], v=[{hv},{nv}]"
            )
        if hq != hkv:
            if not enable_gqa:
                raise ValueError(
                    f"num_heads mismatch (q={hq}, kv={hkv}) requires "
                    "enable_gqa=True"
                )
            if hq % hkv != 0:
                raise ValueError(
                    f"GQA requires Nh_q % Nh_kv == 0, got {hq} % {hkv}"
                )
        if is_causal and nkv < nq:
            raise ValueError(
                f"is_causal=True requires Nkv >= Nq (tail-aligned causal), "
                f"got Nq={nq}, Nkv={nkv}"
            )
        if (wl >= 0 or wr >= 0) and nkv < nq:
            # The band is anchored to the tail-aligned diagonal; with
            # Nq > Nkv early query rows would attend nothing (their window
            # lies entirely before the sequence) — reject like causal does.
            raise ValueError(
                f"window_size requires Nkv >= Nq (tail-aligned band), got "
                f"Nq={nq}, Nkv={nkv}"
            )
        if alibi_slopes is not None:
            ashape = tuple(alibi_slopes.shape)
            if ashape not in ((hq,), (b, hq)):
                raise ValueError(
                    f"alibi_slopes must have shape ({hq},) or ({b}, {hq}), "
                    f"got {ashape}"
                )
        if sinks is not None and tuple(sinks.shape) != (hq,):
            raise ValueError(
                f"sinks must have shape ({hq},) (one logit per query "
                f"head), got {tuple(sinks.shape)}"
            )
        if scale is None:
            scale = 1.0 / math.sqrt(d)

        bias = None
        if attn_mask is not None:
            bias = normalize_attn_mask(attn_mask, b, hq, nq, nkv)

        meta = AttentionMeta(
            scale=float(scale),
            is_causal=bool(is_causal),
            dropout_p=float(dropout_p),
            num_q_heads=hq,
            num_kv_heads=hkv,
            enable_gqa=bool(enable_gqa),
            forward_backend=self.forward_backend or PallasBackend(),
            backward_backend=self.backward_backend or PallasBackend(),
            softcap=float(softcap),
            window=(wl, wr),
        )
        return meta, query, key, value, bias


def _validate_attn_mask_shape(shape, b, hq, nq, nkv) -> None:
    """4-D mask dims must be broadcast-compatible with [B, Hq, Nq, Nkv]
    (reference _validate_attn_mask_shape, functional.py:458-506)."""
    expected = (b, hq, nq, nkv)
    for dim, (got, want) in enumerate(zip(shape, expected)):
        if got != 1 and got != want:
            raise ValueError(
                f"attn_mask shape {tuple(shape)} is not broadcastable to "
                f"[B={b}, Hq={hq}, Nq={nq}, Nkv={nkv}] (dim {dim}: {got} vs "
                f"{want})"
            )


def normalize_attn_mask(attn_mask, b: int, hq: int, nq: int, nkv: int):
    """Boolean masks → additive bias; 2-D/3-D → 4-D; broadcast dims stay
    compact (size 1) so kernels can use size-1 block mapping.

    Reference: functional.py:750-810.
    """
    if attn_mask.ndim == 2:
        attn_mask = attn_mask[None, None]
    elif attn_mask.ndim == 3:
        attn_mask = attn_mask[:, None]
    elif attn_mask.ndim != 4:
        raise ValueError(
            f"attn_mask must be 2-D, 3-D or 4-D, got {attn_mask.ndim}-D"
        )
    _validate_attn_mask_shape(attn_mask.shape, b, hq, nq, nkv)
    if attn_mask.dtype == jnp.bool_:
        # SDPA semantics: True participates; False gets -inf-like bias.
        from .ops.reference import DEFAULT_MASK_VALUE

        bias = jnp.where(attn_mask, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
    else:
        bias = attn_mask.astype(jnp.float32)
    return bias


__all__ = [
    "Backend",
    "SDPABackend",
    "PallasBackend",
    "AttentionMeta",
    "FFPAAttnMeta",
    "normalize_attn_mask",
    "MIN_LARGE_D",
    "MAX_LARGE_D",
]
