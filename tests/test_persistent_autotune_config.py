"""Persistent tuned-config store unit tests (hermetic, no accelerator).

Mirrors reference tests/test_persistent_autotune_config.py coverage:
schema round-trip, nearest-headdim / upper-seqlen selection, flag
filtering, bf16->fp16 fallback, malformed-JSON tolerance, dir override,
cache clearing (reference _persistent_autotune.py semantics).
"""

import json

import pytest

from ffpa_attn_tpu.autotune.store import (
    ConfigKey,
    clear_lookup_cache,
    lookup_tuned_config,
    make_entry,
    merge_entries,
    sanitize_device_kind,
    write_config_file,
)
from ffpa_attn_tpu.ops.config import BlockConfig


@pytest.fixture
def store_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("FFPA_TPU_TUNED_CONFIG_DIR", str(tmp_path))
    clear_lookup_cache()
    yield tmp_path
    clear_lookup_cache()


def _key(**kw):
    base = dict(
        direction="fwd",
        dtype="bfloat16",
        headdim=512,
        headdim_v=512,
        seqlen_q=8192,
        seqlen_k=8192,
        causal=False,
        has_bias=False,
        dropout=False,
        gqa=False,
    )
    base.update(kw)
    return ConfigKey(**base)


def _lookup(**kw):
    base = dict(
        direction="fwd",
        d=512,
        nq=8192,
        nkv=8192,
        dtype="bfloat16",
        causal=False,
        has_bias=False,
        dropout=False,
        gqa=False,
        device_kind="FakeTPU v99",
    )
    base.update(kw)
    return lookup_tuned_config(**base)


def test_roundtrip_and_exact_hit(store_dir):
    cfg = BlockConfig(block_q=512, block_kv=1024)
    write_config_file([make_entry(_key(), cfg, ms=1.0)], device_kind="FakeTPU v99")
    got = _lookup()
    assert got is not None
    assert got.block_q == 512 and got.block_kv == 1024


def test_flag_filtering(store_dir):
    cfg = BlockConfig(block_q=512)
    write_config_file(
        [make_entry(_key(causal=True), cfg)], device_kind="FakeTPU v99"
    )
    assert _lookup(causal=False) is None
    assert _lookup(causal=True) is not None


def test_bf16_entry_serves_fp16_queries(store_dir):
    write_config_file(
        [make_entry(_key(dtype="bfloat16"), BlockConfig(block_q=256))],
        device_kind="FakeTPU v99",
    )
    assert _lookup(dtype="float16") is not None
    # but not the reverse
    clear_lookup_cache()
    write_config_file(
        [make_entry(_key(dtype="float16"), BlockConfig(block_q=256))],
        device_kind="FakeTPU v98",
        overwrite=True,
    )
    assert _lookup(dtype="bfloat16", device_kind="FakeTPU v98") is None


def test_nearest_headdim(store_dir):
    write_config_file(
        [
            make_entry(_key(headdim=320, headdim_v=320), BlockConfig(block_q=1024)),
            make_entry(_key(headdim=1024, headdim_v=1024), BlockConfig(block_q=128)),
        ],
        device_kind="FakeTPU v99",
    )
    got = _lookup(d=384)
    assert got.block_q == 1024  # 320 is nearer to 384 than 1024


def test_upper_seqlen_bucket_preferred(store_dir):
    write_config_file(
        [
            make_entry(
                _key(seqlen_q=4096, seqlen_k=4096), BlockConfig(block_q=128)
            ),
            make_entry(
                _key(seqlen_q=16384, seqlen_k=16384), BlockConfig(block_q=1024)
            ),
        ],
        device_kind="FakeTPU v99",
    )
    got = _lookup(nq=8192, nkv=8192)
    # 16384 covers the request; 4096 does not.
    assert got.block_q == 1024


def test_malformed_json_is_empty(store_dir):
    path = store_dir / f"{sanitize_device_kind('FakeTPU v99')}.json"
    path.write_text("{not json")
    clear_lookup_cache()
    assert _lookup() is None
    path.write_text(json.dumps({"schema_version": 999, "entries": []}))
    clear_lookup_cache()
    assert _lookup() is None


def test_merge_dedup_by_key(store_dir):
    e1 = make_entry(_key(), BlockConfig(block_q=128))
    e2 = make_entry(_key(), BlockConfig(block_q=512))
    merged = merge_entries([e1], [e2])
    assert len(merged) == 1
    assert merged[0]["config"]["block_q"] == 512


def test_kill_switch(store_dir, monkeypatch):
    write_config_file(
        [make_entry(_key(), BlockConfig(block_q=512))], device_kind="FakeTPU v99"
    )
    monkeypatch.setenv("FFPA_TPU_SKIP_TUNED_CONFIG", "1")
    assert _lookup() is None
