"""Kernel block-shape configuration + VMEM cost model.

The analog of the reference's tile-constant tables and ``can_implement``
SMEM-capacity probing (reference: cute/_utils.py:21-66, 247-304). On TPU the
scarce resource is VMEM (~16 MiB usable per core on v5e after Mosaic
overheads); the cost model below must never let autotune emit a config
Mosaic rejects (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

LANE = 128  # TPU lane width; minimum useful block dim.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclass(frozen=True)
class BlockConfig:
    """Block shapes for the FFPA kernels.

    Forward: grid cell owns (block_q x D) of Q and streams (block_kv x D)
    K/V tiles. Backward dK/dV: cell owns a KV tile and streams Q tiles;
    backward dQ: cell owns a Q tile and streams KV tiles — the reference's
    split-launch design (SURVEY.md §7 step 3), never the shared-pid scheme.
    """

    block_q: int = 256
    block_kv: int = 512
    # Backward tiles (reference keeps separate fwd/bwd tile tables,
    # cute/_utils.py:21-55).
    block_q_dkdv: int = 256
    block_kv_dkdv: int = 256
    block_q_dq: int = 256
    block_kv_dq: int = 256
    # Accumulator-split dispatch (the TPU re-derivation of the reference's
    # M8N1<->M4N2 accumulator-layout choice at D>=768,
    # csrc/cuffpa/cute/sm_120/split_d_m4n2.cuh:29-47): when False, the
    # dK/dV kernel accumulates ONLY dV in VMEM and dK is produced by an
    # XLA einsum over the materialized dS slab (same matmul count — the
    # dS^T@Q unit moves out of the kernel), freeing bkv*D*4 bytes of
    # scratch so KV-owner tiles can grow at large D. Requires a path that
    # materializes dS (the handoff/from-S backward; the plain recompute
    # path forces it back to True).
    dkdv_dk_in_kernel: bool = True
    # Storage width (bits) of the HANDED-OFF dS slab: 16 = bf16, 8 =
    # float8_e4m3fn. The handoff's extra HBM traffic is one dS write plus
    # one dS read per element — at long sequence (N=16K the slab totals
    # 16 GiB bf16) that stream is the scheme's overhead, and fp8 halves it.
    # Cost (measured vs the fp32 oracle): dq picks up ~3% RMS / ~5%
    # worst-element relative noise — per-element roundings do NOT average
    # out in a random-sign dot product, so the worst element sits AT the
    # public 5e-2 bf16 contract. Hence the FFPA_TPU_ALLOW_FP8_DS opt-in
    # (env.py); without it the backward silently forces 16. Never honored
    # for fp16 cotangents (1e-2 contract) or biased calls (dbias sums the
    # stored slab); the from-S residual path is unaffected (its dS aliases
    # the bf16 S buffer).
    ds_store_bits: int = 16

    def __post_init__(self):
        if self.ds_store_bits not in (8, 16):
            raise ValueError(
                f"ds_store_bits must be 8 or 16, got {self.ds_store_bits}"
            )
        for name in (
            "block_q",
            "block_kv",
            "block_q_dkdv",
            "block_kv_dkdv",
            "block_q_dq",
            "block_kv_dq",
        ):
            v = getattr(self, name)
            if v <= 0 or v % LANE != 0:
                raise ValueError(
                    f"{name} must be a positive multiple of {LANE}, got {v}"
                )

    def clamp(self, nq: int, nkv: int) -> "BlockConfig":
        """Shrink blocks to the (lane-rounded) problem size."""

        def fit(block: int, n: int) -> int:
            return min(block, max(LANE, _round_up(n, LANE)))

        return replace(
            self,
            block_q=fit(self.block_q, nq),
            block_kv=fit(self.block_kv, nkv),
            block_q_dkdv=fit(self.block_q_dkdv, nq),
            block_kv_dkdv=fit(self.block_kv_dkdv, nkv),
            block_q_dq=fit(self.block_q_dq, nq),
            block_kv_dq=fit(self.block_kv_dq, nkv),
        )


def fwd_vmem_bytes(
    cfg: BlockConfig,
    d: int,
    dv: int,
    itemsize: int,
    has_bias: bool,
    emit_scores: bool = False,
) -> int:
    """Estimated VMEM for one forward grid cell (double-buffered streams).

    All grid-mapped blocks are double-buffered by Mosaic — Q and O blocks
    change with the (parallel) q-grid dim, K/V/bias with the kv dim
    (calibrated against a measured 16.15M OOM at (1024,512)+bias where the
    single-buffer model predicted 13.2M). ``emit_scores`` adds the
    double-buffered S-residual output block (S-resident backward).
    """
    bq, bkv = cfg.block_q, cfg.block_kv
    q_tile = 2 * bq * d * itemsize
    kv_tiles = 2 * (bkv * d + bkv * dv) * itemsize
    scores = bq * bkv * 4
    scratch = bq * LANE * 4 * 2 + bq * dv * 4  # m, l, acc
    out = 2 * bq * dv * itemsize
    bias = 2 * bq * bkv * 4 if has_bias else 0
    s_out = 2 * bq * bkv * itemsize if emit_scores else 0
    return q_tile + kv_tiles + scores + scratch + out + bias + s_out


def bwd_dkdv_vmem_bytes(
    cfg: BlockConfig,
    d: int,
    dv: int,
    itemsize: int,
    has_bias: bool,
    emit_ds: bool = False,
    precise_pv: bool = False,
) -> int:
    """Calibrated against the v5e D=512 sweep: owner KV tiles are
    single-buffered (fixed per cell), streamed Q/dO tiles double-buffered,
    and the tile math holds ~3 score-sized fp32 live values (s, dP, dS).
    ``emit_ds`` adds the double-buffered dS handoff output block.
    ``precise_pv`` (the fp16 hi+lo dV split) adds the do_lo input stream
    plus ~2 extra live score tiles (p_hi/p_lo and their scheduling slack)
    — without this term a 512x512 handoff tile modeled at 10.7 MiB
    measured 16.05 MiB scoped VMEM and failed AOT compile at
    fp16 D=640 (round-5 probe)."""
    bq, bkv = cfg.block_q_dkdv, cfg.block_kv_dkdv
    dk_in = cfg.dkdv_dk_in_kernel
    # With dK out of kernel only its fp32 scratch drops here (K/Q are
    # still read for the S recompute).
    kv_tiles = bkv * (d + dv) * itemsize
    q_streams = 2 * bq * (d + dv) * itemsize
    scores = 3 * bq * bkv * 4
    scratch = bkv * ((d if dk_in else 0) + dv) * 4  # dk?, dv accumulators
    bias = 2 * bq * bkv * 4 if has_bias else 0
    ds_out = 2 * bq * bkv * (cfg.ds_store_bits // 8) if emit_ds else 0
    f16_tax = (2 * bq * dv * itemsize + 2 * bq * bkv * 4) if precise_pv else 0
    return kv_tiles + q_streams + scores + scratch + bias + ds_out + f16_tax


def bwd_dkdv_from_s_vmem_bytes(
    cfg: BlockConfig, d: int, dv: int, itemsize: int
) -> int:
    """VMEM for the S-resident dK/dV kernel: no K tile, no S recompute; the
    streamed inputs are (S, Q, dO) tiles and the dS block is always emitted
    (aliased over S in HBM)."""
    bq, bkv = cfg.block_q_dkdv, cfg.block_kv_dkdv
    dk_in = cfg.dkdv_dk_in_kernel
    v_tile = bkv * dv * itemsize  # owner
    # With dK in kernel, Q streams in; without it Q is not read at all
    # (the from-S kernel needs only s/do/v for p, dP, dV).
    streams = 2 * (
        (bq * d if dk_in else 0) + bq * dv + bq * bkv
    ) * itemsize  # q?, do, s
    scores = 3 * bq * bkv * 4  # p, dp, ds fp32 live values
    scratch = bkv * ((d if dk_in else 0) + dv) * 4  # dk?, dv accumulators
    ds_out = 2 * bq * bkv * itemsize
    return v_tile + streams + scores + scratch + ds_out


def bwd_dq_vmem_bytes(
    cfg: BlockConfig, d: int, dv: int, itemsize: int, has_bias: bool
) -> int:
    bq, bkv = cfg.block_q_dq, cfg.block_kv_dq
    q_tiles = bq * (d + dv) * itemsize  # q, do (owners)
    kv_streams = 2 * bkv * (d + dv) * itemsize
    scores = 3 * bq * bkv * 4
    scratch = bq * d * 4  # dq accumulator
    bias = 2 * bq * bkv * 4 if has_bias else 0
    return q_tiles + kv_streams + scores + scratch + bias


def default_config(
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    itemsize: int = 2,
    has_bias: bool = False,
    vmem_limit: Optional[int] = None,
) -> BlockConfig:
    """Pick a safe default block config for the problem shape.

    Heuristic re-derivation of the reference's default
    ``{BM:128, BN:64, BHD:64}`` (triton/_ffpa_fwd.py:971-995) for the MXU +
    VMEM regime, informed by the measured D=512 N=8192 sweep: larger
    block_q dominates (it divides the K/V HBM re-read factor nq/block_q),
    with block_kv=512 the sweet spot — (1024, 512) hit 122.6 TF vs 105 TF
    for (256, 512). Larger D leaves less VMEM so block_q steps down — the
    TPU analog of the M8N1<->M4N2 register-pressure dispatch (BASELINE.md).
    """
    from ..env import ENV

    limit = vmem_limit if vmem_limit is not None else ENV.vmem_limit_bytes()
    for bq in (1024, 512, 256, 128):
        for bkv in (512, 256, 128):
            cfg = BlockConfig(block_q=bq, block_kv=bkv).clamp(nq, nkv)
            if fwd_vmem_bytes(cfg, d, dv, itemsize, has_bias) <= limit:
                return cfg
    return BlockConfig(block_q=LANE, block_kv=LANE).clamp(nq, nkv)
