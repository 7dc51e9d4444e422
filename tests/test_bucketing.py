"""Seqlen bucketing tests (reference: tests/test_triton_autotune_mode.py
bucketing coverage)."""

import pytest

from ffpa_attn_tpu.autotune.bucket import (
    bucket_autotune_seqlen,
    exact_autotune_seqlen_keys,
)


def test_fast_mode_1024_bins_capped():
    assert bucket_autotune_seqlen(1, "fast") == 1024
    assert bucket_autotune_seqlen(1024, "fast") == 1024
    assert bucket_autotune_seqlen(1025, "fast") == 2048
    assert bucket_autotune_seqlen(9000, "fast") == 8192  # cap
    assert bucket_autotune_seqlen(100000, "fast") == 8192


def test_max_mode_piecewise():
    assert bucket_autotune_seqlen(60, "max") == 64
    assert bucket_autotune_seqlen(512, "max") == 512
    assert bucket_autotune_seqlen(513, "max") == 640
    assert bucket_autotune_seqlen(1000, "max") == 1024
    assert bucket_autotune_seqlen(1500, "max") == 1536
    assert bucket_autotune_seqlen(3000, "max") == 3072
    assert bucket_autotune_seqlen(8191, "max") == 8192
    assert bucket_autotune_seqlen(99999, "max") == 16384  # cap


def test_exact_context():
    with exact_autotune_seqlen_keys():
        assert bucket_autotune_seqlen(8191, "fast") == 8191
    assert bucket_autotune_seqlen(8191, "fast") == 8192


def test_bad_mode():
    with pytest.raises(ValueError):
        bucket_autotune_seqlen(100, "turbo")
