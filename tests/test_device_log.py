"""Compile-gated device logging lane (FFPA_TPU_DEVICE_LOG_LEVEL).

The reference gates device printf at compile time via FA_LOG_LEVEL +
cutlass.const_expr (cute/utils/fa_logging.py:10-25); the TPU analog is a
trace-time gate around ``pl.debug_print``. These tests check both sides
of the gate in interpret mode: level>=2 emits the curated per-cell line,
level 0 compiles the callsite out entirely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffpa_attn_tpu.ops.flash_fwd import flash_attention_forward


def _run_fwd():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, 1, 256, 320), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 1, 256, 320), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 1, 256, 320), jnp.bfloat16)
    o, lse = flash_attention_forward(
        q, k, v, None, scale=1.0 / np.sqrt(320), is_causal=False
    )
    jax.block_until_ready(o)
    return o


@pytest.mark.parametrize("level,expect", [("0", False), ("2", True)])
def test_device_log_gate(level, expect, monkeypatch, capfd):
    monkeypatch.setenv("FFPA_TPU_DEVICE_LOG_LEVEL", level)
    jax.clear_caches()  # the level lives in the trace, not the jit key
    _run_fwd()
    out = capfd.readouterr()
    text = out.out + out.err
    assert ("ffpa-fwd cell" in text) == expect
