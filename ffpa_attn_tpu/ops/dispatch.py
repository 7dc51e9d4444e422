"""Block-config selection: persistent tuned-config lookup with heuristic
defaults.

The analog of the reference's non-autotune launcher path — persistent-config
lookup else defaults (reference: triton/_ffpa_fwd.py:971-995,
_persistent_autotune.py:735).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .config import BlockConfig, default_config


def pick_forward_config(
    *,
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    dtype,
    causal: bool,
    has_bias: bool,
    dropout: bool = False,
    gqa: bool = False,
    group: int = 0,
    f16: bool = False,
) -> BlockConfig:
    """Tuned-config lookup, falling back to the heuristic default.

    ``f16``: the PRIMAL dtype is float16 even though ``dtype`` (the compute
    dtype the kernels see) is bfloat16 — the store query must say float16
    so float16-keyed tuned entries are reachable (the lookup still accepts
    bfloat16 entries for float16 queries, store.py policy)."""
    from ..autotune.store import lookup_tuned_config

    cfg = lookup_tuned_config(
        direction="fwd",
        d=d,
        dv=dv,
        nq=nq,
        nkv=nkv,
        dtype="float16" if f16 else str(jnp.dtype(dtype)),
        causal=causal,
        has_bias=has_bias,
        dropout=dropout,
        gqa=gqa,
        group=group,
    )
    if cfg is not None:
        return cfg
    itemsize = jnp.dtype(dtype).itemsize
    return default_config(d, dv, nq, nkv, itemsize=itemsize, has_bias=has_bias)


def pick_decode_config(
    *, d: int, dv: int, nkv: int, dtype, gqa: bool = False, group: int = 0
) -> Optional[BlockConfig]:
    """Tuned-config lookup for the decode kernel (direction='decode');
    returns None when no entry exists (caller uses the measured default).
    The decode kernel's only block knob is ``block_kv``."""
    from ..autotune.store import lookup_tuned_config

    return lookup_tuned_config(
        direction="decode",
        d=d,
        dv=dv,
        nq=1,
        nkv=nkv,
        dtype=str(jnp.dtype(dtype)),
        causal=False,
        has_bias=False,
        dropout=False,
        gqa=gqa,
        group=group,
    )


def pick_backward_config(
    *,
    d: int,
    dv: int,
    nq: int,
    nkv: int,
    dtype,
    causal: bool,
    has_bias: bool,
    dropout: bool = False,
    gqa: bool = False,
    group: int = 0,
    f16: bool = False,
) -> BlockConfig:
    # ``f16``: float16 PRIMALS under a bf16 compute dtype (the custom_vjp
    # casts before the kernels run, ops/attention.py:_to_compute_dtype).
    # Three things hang off it: the store query dtype (float16-keyed
    # entries were unreachable when the query said bfloat16), the VMEM
    # model's hi+lo dV tax (charged by autotune for f16 tasks — round-5
    # fix: charged at runtime dispatch too), and the fp8-dS proposal
    # (flash_bwd force-narrows it back to 16 for f16 cotangents; don't
    # propose what cannot serve).
    from ..autotune.store import lookup_tuned_config

    from dataclasses import replace

    from ..env import ENV

    f16 = f16 or jnp.dtype(dtype) == jnp.float16

    def propose_fp8(cfg: BlockConfig) -> BlockConfig:
        # FFPA_TPU_ALLOW_FP8_DS is an opt-in PROPOSAL here, not just the
        # safety gate in flash_bwd (which only narrows 8->16): without it,
        # a user setting the flag with no fp8-tuned entry got bf16 slabs
        # regardless (round-4 probe: the flag measured as a no-op). Block
        # shapes are unchanged — fp8 only shrinks the dS output block, so
        # a tuned entry's VMEM feasibility is preserved; flash_bwd still
        # forces 16 for f16 cotangents / bias.
        # Mirror the autotune policy (search.py bwd_candidates): fp8 only
        # where the slab stream is big enough to matter (>= 4096^2 —
        # below that the handoff slab fits unstriped and fp8 buys no
        # bandwidth, only the ~3% dq quantization noise). Keeping the two
        # policies in lockstep means a tuned entry and a dispatch-proposed
        # one behave identically under the same flag.
        if (
            cfg.ds_store_bits == 16
            and ENV.allow_fp8_ds()
            and jnp.dtype(dtype) == jnp.bfloat16
            and not f16
            and not has_bias
            and nq * nkv >= 4096 * 4096
        ):
            return replace(cfg, ds_store_bits=8)
        return cfg

    cfg = lookup_tuned_config(
        direction="bwd",
        d=d,
        dv=dv,
        nq=nq,
        nkv=nkv,
        dtype="float16" if f16 else str(jnp.dtype(dtype)),
        causal=causal,
        has_bias=has_bias,
        dropout=dropout,
        gqa=gqa,
        group=group,
    )
    if cfg is not None:
        return propose_fp8(cfg)
    itemsize = jnp.dtype(dtype).itemsize
    from .config import BlockConfig, bwd_dkdv_vmem_bytes, bwd_dq_vmem_bytes

    limit = ENV.vmem_limit_bytes()
    # Measured v5e D=512 N=8192 per-launch sweeps (tools/sweep_bwd.py, with
    # the dS-handoff output block counted): causal favors narrower KV owner
    # tiles — (512,256) 43.6 ms vs (512,512) 47.4 ms — while non-causal
    # favors (512,512) 61.5 ms. dQ-kernel fallback winner was (512,1024).
    if causal:
        dkdv_prefs = ((512, 256), (256, 512), (512, 512), (1024, 256))
    else:
        dkdv_prefs = ((512, 512), (1024, 512), (1024, 256), (256, 512))
    dq_prefs = ((512, 1024), (1024, 512), (512, 512), (256, 512))
    fallback = ((256, 256), (128, 256), (128, 128))

    def first_fit(prefs, cost_fn, **cost_kw):
        for bq, bkv in tuple(prefs) + fallback:
            cfg = BlockConfig(
                block_q_dkdv=bq, block_kv_dkdv=bkv,
                block_q_dq=bq, block_kv_dq=bkv,
            ).clamp(nq, nkv)
            if cost_fn(cfg, d, dv, itemsize, has_bias, **cost_kw) <= limit:
                return cfg
        return BlockConfig(
            block_q_dkdv=128, block_kv_dkdv=128,
            block_q_dq=128, block_kv_dq=128,
        ).clamp(nq, nkv)

    # dkdv blocks must fit with the handoff dS output (the common path);
    # _fit_dkdv_for_ds re-checks at launch time anyway. fp16 runs the
    # hi+lo dV split, whose extra live tiles the model must charge.
    dkdv = first_fit(
        dkdv_prefs, bwd_dkdv_vmem_bytes, emit_ds=True, precise_pv=f16
    )
    dq = first_fit(dq_prefs, bwd_dq_vmem_bytes)
    return propose_fp8(
        replace(dkdv, block_q_dq=dq.block_q_dq, block_kv_dq=dq.block_kv_dq)
    )
