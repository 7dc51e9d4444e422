"""Timed block-shape search (the TPU analog of triton.autotune).

Reference analog: the autotune wrapper + resilient runner
(reference: triton/_ffpa_fwd.py:1301-1334, triton/_autotune_utils.py:113-180).
On TPU the config space is (block_q, block_kv) per direction; candidates are
pre-pruned by the VMEM cost model (so Mosaic never sees an impossible
config — SURVEY.md §7 hard part 6) and any config that still fails to
compile is skipped, mirroring the reference's resilient-autotuner fallback
walk.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import replace
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from ..env import ENV
from ..logger import init_logger
from ..ops.config import (
    LANE,
    BlockConfig,
    bwd_dkdv_vmem_bytes,
    bwd_dq_vmem_bytes,
    fwd_vmem_bytes,
)

logger = init_logger(__name__)

_FAST_BLOCKS = (256, 512, 1024)
# Max mode includes non-power-of-two LANE multiples: at VMEM-tight D the
# pow2 ladder jumps straight from a fitting block to an OOM one (e.g.
# D=1024 fwd fits block_q 640 but not 1024), leaving K/V re-read factor
# on the table. The VMEM cost model prunes, so extra candidates only cost
# sweep time.
_MAX_BLOCKS = (128, 256, 384, 512, 640, 768, 1024, 1280, 1536, 2048)


def _order_and_cap(out: list, prefs: tuple) -> list:
    """Order candidates so measured-good shapes come first — the config cap
    (FFPA_TPU_AUTOTUNE_MAX_CONFIGS) then keeps the likely winners."""

    def rank(cfg_pair):
        cfg, pair = cfg_pair
        try:
            return (prefs.index(pair), 0, 0)
        except ValueError:
            # Non-pref candidates: larger block_q first (it divides the
            # K/V re-read factor — the measured dominant axis), then
            # block_kv nearest the 512 sweet spot, so a config cap keeps
            # the plausible winners rather than the smallest blocks.
            return (len(prefs) + 1, -pair[0], abs(pair[1] - 512))
    out = [c for c, _ in sorted(out, key=rank)]
    max_configs = ENV.autotune_max_configs()
    if max_configs > 0:
        out = out[:max_configs]
    return out


def fwd_candidates(
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    itemsize: int,
    has_bias: bool,
    mode: str = "fast",
) -> list[BlockConfig]:
    """VMEM-feasible forward (block_q, block_kv) candidates."""
    blocks = _FAST_BLOCKS if mode == "fast" else _MAX_BLOCKS
    limit = ENV.vmem_limit_bytes()
    out = []
    for bq in blocks:
        for bkv in blocks:
            cfg = BlockConfig(block_q=bq, block_kv=bkv).clamp(nq, nkv)
            if fwd_vmem_bytes(cfg, d, dv, itemsize, has_bias) > limit:
                continue
            if all(c != cfg for c, _ in out):
                out.append((cfg, (bq, bkv)))
    # v5e sweep winners first (config.py:default_config rationale).
    return _order_and_cap(
        out, ((1024, 512), (512, 512), (256, 512), (512, 256), (1024, 256))
    )


def bwd_candidates(
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    itemsize: int,
    has_bias: bool,
    mode: str = "fast",
    from_scores: bool = False,
    allow_fp8_ds: bool = True,
) -> list[BlockConfig]:
    """Backward candidates: shared (bq, bkv) for dkdv and dq launches.
    ``from_scores`` prunes with the S-resident kernel's VMEM model."""
    from ..ops.config import bwd_dkdv_from_s_vmem_bytes

    blocks = _FAST_BLOCKS if mode == "fast" else _MAX_BLOCKS
    limit = ENV.vmem_limit_bytes()
    # Accumulator-split variants (dK via the dS-slab einsum instead of
    # in-kernel; config.py dkdv_dk_in_kernel) enter the space at large D
    # on the from-S path, where dropping dK also drops the Q stream —
    # the re-derivation of the reference's M8N1<->M4N2 D>=768 dispatch.
    dk_variants = (True, False) if (from_scores and d >= 640) else (True,)
    # fp8 dS storage halves the handoff slab's write+read HBM stream — the
    # scheme's overhead at long sequence, where the slab exceeds the limit
    # and stripes (~16 GiB bf16 at N=16K). Only proposed where that stream
    # is big enough to matter, never for fp16 tasks (the 1e-2 contract has
    # no quantization margin; flash_bwd.py forces bf16 dS there anyway),
    # and never on the from-S path (its dS aliases the bf16 S residual).
    # Measured dq cost: ~3% relative vs the fp32 oracle (bf16 dS: ~0.4%),
    # inside the bf16 5e-2 contract; dK/dV consume the full-precision
    # in-VMEM dS and are unaffected.
    ds_variants = (16,)
    if (
        allow_fp8_ds
        and ENV.allow_fp8_ds()  # explicit opt-in (contract-boundary noise)
        and not from_scores
        and not has_bias  # dbias sums the stored slab — no fp8 there
        and nq * nkv >= 4096 * 4096
    ):
        ds_variants = (16, 8)
    out = []
    for bq in blocks:
        for bkv in blocks:
            for dk_in in dk_variants:
              for ds_bits in ds_variants:
                cfg = BlockConfig(
                    block_q_dkdv=bq,
                    block_kv_dkdv=bkv,
                    block_q_dq=bq,
                    block_kv_dq=bkv,
                    dkdv_dk_in_kernel=dk_in,
                    ds_store_bits=ds_bits,
                ).clamp(nq, nkv)
                dkdv_bytes = (
                    bwd_dkdv_from_s_vmem_bytes(cfg, d, dv, itemsize)
                    if from_scores
                    else bwd_dkdv_vmem_bytes(
                        cfg, d, dv, itemsize, has_bias,
                        # f16 tasks run the hi+lo dV split; charge its
                        # extra live tiles (fp8-dS is disabled exactly for
                        # those tasks, so reuse that signal).
                        precise_pv=not allow_fp8_ds,
                    )
                )
                if (
                    dkdv_bytes > limit
                    or bwd_dq_vmem_bytes(cfg, d, dv, itemsize, has_bias) > limit
                ):
                    continue
                if all(c != cfg for c, _ in out):
                    out.append((cfg, (bq, bkv)))
    return _order_and_cap(
        out, ((512, 512), (512, 256), (256, 512), (1024, 512), (1024, 256))
    )


def search(
    make_step: Callable[[BlockConfig], Callable],
    q,
    rest: tuple,
    candidates: Iterable[BlockConfig],
    label: str = "",
    iters: int = 5,
) -> tuple[Optional[BlockConfig], float]:
    """Time every candidate with scan-chained iterations (one jit invocation
    per candidate, so the remote-dispatch fixed overhead cancels); skip
    compile/runtime failures — the resilient walk of the reference autotuner
    (triton/_autotune_utils.py:113-180).

    Returns (best_config, best_ms); (None, inf) if everything failed.
    """
    import signal

    from ..cli._bench import time_chained

    deadline = int(os.environ.get("FFPA_TPU_AUTOTUNE_CANDIDATE_TIMEOUT", "420"))

    class _Timeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _Timeout()

    best: Optional[BlockConfig] = None
    best_ms = float("inf")
    for cfg in candidates:
        # Hard per-candidate deadline: a pathological Mosaic compile or a
        # wedged remote-compile call must not stall the whole sweep (the
        # resilient walk covers hangs, not just raised errors). SIGALRM is
        # main-thread only; fall through without it elsewhere.
        use_alarm = (
            deadline > 0
            and threading.current_thread() is threading.main_thread()
        )
        if use_alarm:
            old = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(deadline)
        try:
            ms = time_chained(make_step(cfg), q, *rest, iters=iters)
        except _Timeout:
            logger.warning(
                "autotune[%s]: config %s exceeded %ds deadline; skipped",
                label, cfg, deadline,
            )
            continue
        except Exception as exc:  # Mosaic OOM / lowering error: skip
            logger.debug_once(
                "autotune[%s]: config %s failed: %s", label, cfg, str(exc)[:200]
            )
            continue
        finally:
            if use_alarm:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        logger.debug("autotune[%s]: %s -> %.3f ms", label, cfg, ms)
        if ms < best_ms:
            best, best_ms = cfg, ms
    return best, best_ms


def _search_compute_dtype(q, k, v):
    """Mirror the interface's f16 policy for kernel-level searches: Mosaic
    has no native f16, so production computes in bf16 (fp32 accumulation)
    — time the search the same way. Returns (q, k, v, was_f16)."""
    if q.dtype == jnp.float16:
        cast = lambda t: t.astype(jnp.bfloat16)
        return cast(q), cast(k), cast(v), True
    return q, k, v, False


def autotune_forward(
    q, k, v, bias, *, scale, is_causal, dropout_p=0.0, mode="fast"
) -> tuple[Optional[BlockConfig], float]:
    from ..ops.flash_fwd import flash_attention_forward

    q, k, v, _ = _search_compute_dtype(q, k, v)
    d, dv = q.shape[-1], v.shape[-1]
    nq, nkv = q.shape[2], k.shape[2]
    itemsize = jnp.dtype(q.dtype).itemsize
    cands = fwd_candidates(d, dv, nq, nkv, itemsize, bias is not None, mode)

    def make_step(cfg):
        # Bias rides as a traced arg: a closed-over [B,H,Nq,Nkv] array
        # would be serialized into the program as a literal and overflow /
        # wedge the remote-compile transport (537 MB at N=4096 H=8 — the
        # observed sweep hang).
        if bias is None:

            def step(q_, k_, v_):
                o, _ = flash_attention_forward(
                    q_, k_, v_, None, scale=scale, is_causal=is_causal,
                    dropout_p=dropout_p, config=cfg,
                )
                return o
        else:

            def step(q_, k_, v_, bias_):
                o, _ = flash_attention_forward(
                    q_, k_, v_, bias_, scale=scale, is_causal=is_causal,
                    dropout_p=dropout_p, config=cfg,
                )
                return o

        return step

    rest = (k, v) if bias is None else (k, v, bias)
    return search(
        make_step, q, rest, cands, label=f"fwd d={d} n=({nq},{nkv})"
    )


def autotune_backward(
    q, k, v, bias, *, scale, is_causal, dropout_p=0.0, mode="fast"
) -> tuple[Optional[BlockConfig], float]:
    from ..ops.flash_bwd import flash_attention_backward
    from ..ops.flash_fwd import flash_attention_forward

    d, dv = q.shape[-1], v.shape[-1]
    b, hq, nq, _ = q.shape
    nkv = k.shape[2]
    itemsize = jnp.dtype(q.dtype).itemsize

    # Tune the path the training step will actually run: the S-resident
    # backward when the residual fits the budget (the ACTUAL policy in
    # ops/attention.py, so tuned entries match production routing).
    from ..ops.attention import StaticArgs, _should_save_scores

    use_scores = _should_save_scores(
        StaticArgs(
            scale=scale, is_causal=is_causal, dropout_p=dropout_p,
            fwd_config=None, bwd_config=None, backward_is_sdpa=False,
            grad_kv_storage_dtype=None, grad_q_storage_dtype=None,
        ),
        q, k, v, bias,
    )
    # f16 policy AFTER the residency decision (the gate keys on the f16
    # primal dtype): kernels stream bf16; the f16 cotangent and
    # precise_pv=True exercise the hi+lo dV split the production fp16
    # backward runs, so tuned fp16 entries reflect its real VMEM shape.
    q, k, v, was_f16 = _search_compute_dtype(q, k, v)
    cands = bwd_candidates(
        d, dv, nq, nkv, itemsize, bias is not None, mode,
        from_scores=use_scores,
        # fp16 tasks run bf16 kernels here but production forces bf16 dS
        # for the 1e-2 contract — timing an fp8 candidate would store a
        # config production can't run.
        allow_fp8_ds=not was_f16,
    )

    fwd = jax.jit(
        lambda q_, k_, v_, b_: flash_attention_forward(
            q_, k_, v_, b_, scale=scale, is_causal=is_causal,
            dropout_p=dropout_p, return_scores=use_scores,
        )
    )
    if use_scores:
        o, lse, scores = fwd(q, k, v, bias)
    else:
        (o, lse), scores = fwd(q, k, v, bias), None
    do = jnp.ones_like(o, jnp.float16) if was_f16 else jnp.ones_like(o)

    def make_step(cfg):
        def step(q_, k_, v_, o_, lse_, do_, *rest):
            # Chain on dq; fold dk/dv into the scalar extra so XLA cannot
            # dead-code-eliminate the dK/dV kernel. bias/scores arrive as
            # traced args (closure constants would wedge remote compile).
            rest_list = list(rest)
            bias_ = rest_list.pop(0) if bias is not None else None
            scores_ = rest_list.pop(0) if rest_list else None
            dq, dk, dvv, _ = flash_attention_backward(
                q_, k_, v_, bias_, o_, lse_, do_, scale=scale,
                is_causal=is_causal, dropout_p=dropout_p, config=cfg,
                scores=scores_, precise_pv=was_f16,
            )
            extra = jnp.sum(dk.astype(jnp.float32)) + jnp.sum(
                dvv.astype(jnp.float32)
            )
            return dq, extra

        return step

    rest = (
        (k, v, o, lse, do)
        + (() if bias is None else (bias,))
        + ((scores,) if use_scores else ())
    )
    return search(
        make_step,
        q,
        rest,
        cands,
        label=f"bwd d={d} n=({nq},{nkv}) sres={use_scores}",
    )


def autotune_varlen(
    q3, k3, v3, cu, max_seqlen, *, scale, causal=True, mode="fast"
) -> tuple[Optional[BlockConfig], float]:
    """Varlen tile-shape search (direction='varlen'): times the packed
    forward over (block_q, block_kv) pairs."""
    from ..ops.varlen import ffpa_varlen_attention

    q3, k3, v3, _ = _search_compute_dtype(q3, k3, v3)
    blocks = (128, 256, 512) if mode == "fast" else (128, 256, 512, 1024)
    cands = []
    for bq in blocks:
        for bkv in blocks:
            cfg = BlockConfig(block_q=bq, block_kv=bkv)
            if all(c != cfg for c in cands):
                cands.append(cfg)

    def make_step(cfg):
        def step(q_, k_, v_):
            return ffpa_varlen_attention(
                q_, k_, v_, cu, cu, max_seqlen, max_seqlen,
                softmax_scale=scale, causal=causal,
                block_q=cfg.block_q, block_kv=cfg.block_kv,
            )

        return step

    return search(
        make_step, q3, (k3, v3), cands,
        label=f"varlen t={q3.shape[0]}",
    )


def autotune_decode(
    q, k, v, *, scale, mode="fast"
) -> tuple[Optional[BlockConfig], float]:
    """Decode block_kv search (direction='decode'; the kernel's only block
    knob — VERDICT round-1 gap: hard-coded 1024)."""
    from ..ops.decode import _decode_forward

    q, k, v, _ = _search_compute_dtype(q, k, v)
    nkv = k.shape[2]
    blocks = (512, 1024, 2048) if mode == "fast" else (256, 512, 1024, 2048, 4096)
    cands = []
    for bkv in blocks:
        if bkv <= max(256, nkv):
            cfg = BlockConfig(block_kv=bkv)
            if all(c != cfg for c in cands):
                cands.append(cfg)

    def make_step(cfg):
        def step(q_, k_, v_):
            o, _ = _decode_forward(
                q_, k_, v_, None, scale=scale, is_causal=False,
                block_kv=cfg.block_kv,
            )
            return o

        return step

    return search(
        make_step, q, (k, v), cands,
        label=f"decode d={q.shape[-1]} nkv={nkv}",
    )
