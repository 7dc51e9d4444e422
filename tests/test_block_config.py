"""Block config + VMEM cost model unit tests (the can_implement analog)."""

import pytest

from ffpa_attn_tpu.ops.config import (
    BlockConfig,
    bwd_dkdv_vmem_bytes,
    bwd_dq_vmem_bytes,
    default_config,
    fwd_vmem_bytes,
)
from ffpa_attn_tpu.autotune.search import bwd_candidates, fwd_candidates


def test_block_validation():
    with pytest.raises(ValueError):
        BlockConfig(block_q=100)
    with pytest.raises(ValueError):
        BlockConfig(block_kv=-128)
    BlockConfig(block_q=128, block_kv=1024)  # ok


def test_clamp_rounds_to_lanes():
    cfg = BlockConfig(block_q=1024, block_kv=1024).clamp(250, 384)
    assert cfg.block_q == 256  # 250 rounded up to 256
    assert cfg.block_kv == 384


def test_default_config_fits_budget(monkeypatch):
    monkeypatch.setenv("FFPA_TPU_VMEM_LIMIT_BYTES", str(4 * 1024 * 1024))
    cfg = default_config(1024, 1024, 8192, 8192, itemsize=2, has_bias=True)
    assert (
        fwd_vmem_bytes(cfg, 1024, 1024, 2, True) <= 4 * 1024 * 1024
    )


def test_candidates_all_feasible(monkeypatch):
    monkeypatch.setenv("FFPA_TPU_VMEM_LIMIT_BYTES", str(8 * 1024 * 1024))
    for cfg in fwd_candidates(1024, 1024, 8192, 8192, 2, True, mode="max"):
        assert fwd_vmem_bytes(cfg, 1024, 1024, 2, True) <= 8 * 1024 * 1024
    for cfg in bwd_candidates(1024, 1024, 8192, 8192, 2, False, mode="max"):
        assert bwd_dkdv_vmem_bytes(cfg, 1024, 1024, 2, False) <= 8 * 1024 * 1024
        assert bwd_dq_vmem_bytes(cfg, 1024, 1024, 2, False) <= 8 * 1024 * 1024


def test_max_configs_env_cap(monkeypatch):
    monkeypatch.setenv("FFPA_TPU_AUTOTUNE_MAX_CONFIGS", "2")
    assert len(fwd_candidates(512, 512, 8192, 8192, 2, False, mode="max")) <= 2
