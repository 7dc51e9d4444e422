"""FLOPs model unit tests (reference: tests/test_perf_tflops.py)."""

import pytest

from ffpa_attn_tpu.cli._flops import (
    attention_flops,
    attention_valid_pairs,
    format_tflops,
    tflops_from_ms,
)


def test_pairs_non_causal():
    assert attention_valid_pairs(4, 8, False) == 32


def test_pairs_causal_square():
    # N=4 causal: 1+2+3+4 = 10
    assert attention_valid_pairs(4, 4, True) == 10


def test_pairs_causal_tail_aligned():
    # Nq=2, Nkv=4, offset=2: row0 -> 3 cols, row1 -> 4 cols
    assert attention_valid_pairs(2, 4, True) == 7


def test_pairs_decode_tail():
    # Nq=1, Nkv=100: the single row attends everything
    assert attention_valid_pairs(1, 100, True) == 100


def test_bwd_is_2_5x():
    fwd = attention_flops(1, 2, 128, 128, 64, direction="fwd")
    bwd = attention_flops(1, 2, 128, 128, 64, direction="bwd")
    assert bwd == pytest.approx(2.5 * fwd)


def test_flops_formula():
    # 2 * B * H * pairs * (d + dv)
    assert attention_flops(1, 1, 2, 2, 8, direction="fwd") == 2 * 4 * 16


def test_tflops_and_format():
    assert tflops_from_ms(1e12, 1000.0) == pytest.approx(1.0)
    assert format_tflops(97.3) == "97T"
    assert format_tflops(1.94) == "1.9T"


def test_bad_direction():
    with pytest.raises(ValueError):
        attention_flops(1, 1, 2, 2, 8, direction="sideways")
