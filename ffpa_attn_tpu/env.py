"""Runtime environment flags for FFPA-TPU.

TPU-native analog of the reference's runtime env-var tier (reference:
src/ffpa_attn/env.py and the runtime vars listed in SURVEY.md §5). Unlike
the reference there is no build-time codegen tier — Pallas kernels are
JIT-compiled by Mosaic — so this module only exposes runtime switches.

All flags are read lazily so tests can monkeypatch ``os.environ``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def _env_bool(name: str, default: bool = False) -> bool:
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int) -> int:
    val = os.environ.get(name)
    if val is None:
        return default
    try:
        return int(val)
    except ValueError:
        return default


@dataclass(frozen=True)
class EnvSnapshot:
    """A frozen snapshot of all runtime flags (for logging / debugging)."""

    allow_small_d: bool
    skip_persistent_tuned_config: bool
    tuned_config_dir: str | None
    autotune_max_configs: int
    interpret: bool
    vmem_limit_bytes: int
    min_seqlen_q: int
    min_seqlen_kv: int
    ds_handoff_limit_bytes: int
    scores_residual_limit_bytes: int


class ENV:
    """Namespace of runtime env flags (reference analog: env.py `class ENV`)."""

    @staticmethod
    def allow_small_d() -> bool:
        """Allow the Pallas path for D<=256 (reference: FFPA_*_ALLOW_SMALL_D,
        functional.py:54-79)."""
        return _env_bool("FFPA_TPU_ALLOW_SMALL_D", False)

    @staticmethod
    def skip_persistent_tuned_config() -> bool:
        """Kill-switch for the persistent tuned-config store (reference:
        FFPA_SKIP_PERSISIT_TUNED_CONFIG, _persistent_autotune.py:354-359)."""
        return _env_bool("FFPA_TPU_SKIP_TUNED_CONFIG", False)

    @staticmethod
    def tuned_config_dir() -> str | None:
        """Override directory for tuned-config JSONs (reference:
        FFPA_TUNED_CONFIG_DIR)."""
        return os.environ.get("FFPA_TPU_TUNED_CONFIG_DIR")

    @staticmethod
    def autotune_max_configs() -> int:
        """Cap on configs timed per autotune case (reference:
        FFPA_AUTOTUNE_MAX_CONFIGS)."""
        return _env_int("FFPA_TPU_AUTOTUNE_MAX_CONFIGS", 0)

    @staticmethod
    def force_interpret() -> bool:
        """Force Pallas interpret mode (useful on CPU test hosts)."""
        return _env_bool("FFPA_TPU_INTERPRET", False)

    @staticmethod
    def vmem_limit_bytes() -> int:
        """Per-kernel VMEM budget used by the block-shape cost model.

        The analog of the reference's per-arch SMEM capacity probing
        (cute/_utils.py:247-304). v5e has ~16 MiB VMEM/core; empirically
        ~12 MiB is usable once Mosaic's pipelining overheads are counted
        (measured via the D=512 N=8192 block sweep: (1024,1024) tiles at
        ~13.5 MiB fail to compile, (1024,512) at ~8.5 MiB pass).
        """
        return _env_int("FFPA_TPU_VMEM_LIMIT_BYTES", 13 * 1024 * 1024 + 512 * 1024)

    @staticmethod
    def min_seqlen_q() -> int:
        """Below this Nq (but >= decode threshold) the dense Pallas kernel
        loses to XLA SDPA; fall back (reference analog functional.py:591-639)."""
        return _env_int("FFPA_TPU_MIN_SEQLEN_Q", 128)

    @staticmethod
    def min_seqlen_kv() -> int:
        return _env_int("FFPA_TPU_MIN_SEQLEN_KV", 128)

    @staticmethod
    def ds_handoff_limit_bytes() -> int:
        """Max HBM bytes for the dS score-gradient handoff buffer.

        The dS-handoff backward (flash_bwd.py) removes the dQ kernel's
        S/dP recompute (2 of 7 matmul-equivalents) by materializing the
        bf16 score gradient once; above this budget it falls back to the
        recompute scheme. 0 disables the handoff entirely.
        """
        return _env_int(
            "FFPA_TPU_DS_HANDOFF_LIMIT_BYTES", 5 * 1024 * 1024 * 1024
        )

    @staticmethod
    def allow_fp8_ds() -> bool:
        """Opt-in for float8_e4m3fn dS-handoff storage (BlockConfig
        ds_store_bits=8). Halves the handoff slab's HBM write+read stream
        (16 GiB bf16 at N=16K self-attn) at a measured dq cost of ~3% RMS /
        ~5% worst-element relative error vs the fp32 oracle — AT the 5e-2
        bf16 gradient contract boundary, hence default-off: with the flag
        unset the backward silently stores bf16 dS and the autotune never
        proposes fp8 candidates. Experimental speed knob for
        bandwidth-bound long-sequence backwards."""
        return _env_bool("FFPA_TPU_ALLOW_FP8_DS", False)

    @staticmethod
    def f16_pv_mode() -> str:
        """dV-precision scheme for float16 inputs (flash_bwd._dv_accumulate):

        'hilo' (default) — split BOTH P and the f16 cotangent into hi+lo
        bf16 pairs: 3 dV matmuls (7 backward units total), measured error
        ~1e-5 (beats the reference's native-fp16 path).
        'psplit' — split P only: 2 dV matmuls (6 units).
        'plain' — single bf16 dV matmul (5 units, the bf16 cost).

        The cheaper modes trade dV rounding error for ~15-30% backward
        time; the shipped default is whichever the measured contract table
        (docs/design.md "fp16") shows holding 1e-2 with margin."""
        import os

        mode = os.environ.get("FFPA_TPU_F16_PV_MODE", "hilo").lower()
        if mode not in ("hilo", "psplit", "plain"):
            raise ValueError(
                f"FFPA_TPU_F16_PV_MODE must be hilo|psplit|plain, got {mode!r}"
            )
        return mode

    @staticmethod
    def hbm_bytes() -> int:
        """Total device HBM assumed by the dS-handoff headroom gate
        (v5e: 16 GiB)."""
        return _env_int("FFPA_TPU_HBM_BYTES", 16 * 1024 * 1024 * 1024)

    @staticmethod
    def hbm_model_margin_bytes() -> int:
        """HBM reserved for co-resident model state when gating the
        dS-handoff slab (attention is rarely the only tenant in a real
        training step; default leaves 4 GiB for weights/optimizer/XLA
        workspace)."""
        return _env_int(
            "FFPA_TPU_HBM_MODEL_MARGIN_BYTES", 4 * 1024 * 1024 * 1024
        )

    @staticmethod
    def scores_residual_limit_bytes() -> int:
        """Max HBM bytes for the S-resident training residual.

        When the (padded) bf16 score matrix [B, Hq, Nq, Nkv] fits this
        budget, the training-path forward emits it as an extra residual and
        the backward drops its S recompute entirely — a 4-matmul backward
        (dP, dV, dK in the from-S kernel + the dS-handoff dQ einsum),
        matching the information advantage XLA's composite SDPA has when it
        saves the probability matrix. 0 disables S-residency.

        The budget is per attention call. Layer-stacked training should
        either keep the default (and rely on layer-level ``jax.checkpoint``,
        under which only one layer's S is live at a time) or set the env
        var lower. Since round 3 the binding guard in AUTO mode is the
        measured-headroom check in ``_resident_head_count`` (scaled by
        ``scores_auto_assumed_layers``), so this cap is a coarse upper
        bound; partial head residency means a budget below the full
        residual still buys a hybrid 4/5-matmul backward.
        """
        return _env_int(
            "FFPA_TPU_SCORES_RESIDUAL_LIMIT_BYTES",
            8 * 1024 * 1024 * 1024,
        )

    @staticmethod
    def scores_auto_assumed_layers() -> int:
        """Layer multiplier for the AUTO S-residency headroom gate.

        ``_should_save_scores`` sees ONE attention call, but in a stacked
        model without per-layer remat every layer's S residual is live from
        forward to backward simultaneously. Auto mode therefore requires
        headroom for this many copies of the residual before opting in
        (default 2). Models using layer-level ``jax.checkpoint`` (only one
        layer's S live at a time) or single-layer benchmarks may set 1;
        deep no-remat stacks should set their layer count, or pass
        ``save_scores=False`` explicitly.
        """
        return _env_int("FFPA_TPU_SCORES_AUTO_ASSUMED_LAYERS", 2)

    @staticmethod
    def device_log_level() -> int:
        """Device-side kernel trace level (the FA_LOG_LEVEL analog,
        reference cute/utils/fa_logging.py:10-25):

        0 off | 1 host-only (logger.py) | 2 curated kernel traces |
        3 all kernel traces (noisy, perf hit).

        Levels >= 2 insert ``pl.debug_print`` callsites. The gate is a
        TRACE-time Python ``if`` — below-threshold callsites never enter
        the jaxpr, so the compiled kernel is bit-identical to logging-off
        (the compile-time elimination the reference gets from
        ``cutlass.const_expr``). Changing the level after a kernel has
        been jit-cached requires a fresh trace, same as the reference's
        compile-key behavior.
        """
        return _env_int("FFPA_TPU_DEVICE_LOG_LEVEL", 0)

    @staticmethod
    def snapshot() -> EnvSnapshot:
        return EnvSnapshot(
            allow_small_d=ENV.allow_small_d(),
            skip_persistent_tuned_config=ENV.skip_persistent_tuned_config(),
            tuned_config_dir=ENV.tuned_config_dir(),
            autotune_max_configs=ENV.autotune_max_configs(),
            interpret=ENV.force_interpret(),
            vmem_limit_bytes=ENV.vmem_limit_bytes(),
            min_seqlen_q=ENV.min_seqlen_q(),
            min_seqlen_kv=ENV.min_seqlen_kv(),
            ds_handoff_limit_bytes=ENV.ds_handoff_limit_bytes(),
            scores_residual_limit_bytes=ENV.scores_residual_limit_bytes(),
        )
