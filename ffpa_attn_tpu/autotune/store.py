"""Persistent tuned-config store.

Re-implementation (TPU-keyed) of the reference device-local JSON store
(reference: src/ffpa_attn/triton/_persistent_autotune.py): schema v1 files
named after the accelerator (``configs/{sanitized_device_kind}.json``), each
entry keyed by (direction, dtype, headdim, seqlens, feature flags) mapping to
a block config. Lookup semantics mirror the reference:

* exact flag filtering (causal / bias / dropout / gqa), with bf16 entries
  usable as an fp16 fallback (_persistent_autotune.py:611-617);
* nearest head-dim selection (:693-702);
* upper-or-max sequence-length bucket selection (:704-725);
* ``FFPA_TPU_TUNED_CONFIG_DIR`` override and a skip kill-switch;
* malformed/mismatched-schema JSON treated as empty, never an error
  (:409-444);
* lru-cached loading with an explicit cache-clear hook (:589).
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from dataclasses import MISSING, asdict, dataclass, fields
from functools import lru_cache
from pathlib import Path
from typing import Any, Optional

from ..env import ENV
from ..logger import init_logger
from ..ops.config import BlockConfig

logger = init_logger(__name__)

SCHEMA_VERSION = 1

_BUNDLED_DIR = Path(__file__).parent / "configs"

# Config fields persisted per entry.
_CONFIG_FIELDS = (
    "block_q",
    "block_kv",
    "block_q_dkdv",
    "block_kv_dkdv",
    "block_q_dq",
    "block_kv_dq",
    "dkdv_dk_in_kernel",
    "ds_store_bits",
)
_BOOL_CONFIG_FIELDS = ("dkdv_dk_in_kernel",)


def sanitize_device_kind(kind: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]+", "_", kind.strip()) or "unknown"


def current_device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


@dataclass(frozen=True)
class ConfigKey:
    """Variant key for one tuned entry (reference entry schema)."""

    direction: str  # 'fwd' | 'bwd' | 'decode'
    dtype: str  # 'float16' | 'bfloat16'
    headdim: int
    headdim_v: int
    seqlen_q: int
    seqlen_k: int
    causal: bool
    has_bias: bool
    dropout: bool
    gqa: bool
    # KV grouping factor (Hq // Hkv) for gqa entries: 4 for the default GQA
    # variant, equal to H for MQA. 0 = unspecified/MHA (pre-group schema
    # entries load as 0). A soft RANK in lookup, never a filter — the
    # reference treats head layout the same way
    # (_persistent_autotune.py:503-527).
    group: int = 0

    def to_json(self) -> dict[str, Any]:
        return asdict(self)


def config_dirs() -> list[Path]:
    dirs: list[Path] = []
    override = ENV.tuned_config_dir()
    if override:
        dirs.append(Path(override))
    dirs.append(_BUNDLED_DIR)
    return dirs


def _config_path(dir_: Path, device_kind: str) -> Path:
    return dir_ / f"{sanitize_device_kind(device_kind)}.json"


def _load_file(path: Path) -> list[dict[str, Any]]:
    """Load entries; malformed or mismatched schema => empty (never raises)."""
    try:
        with open(path) as f:
            payload = json.load(f)
    except (OSError, json.JSONDecodeError):
        return []
    if not isinstance(payload, dict):
        return []
    if payload.get("schema_version") != SCHEMA_VERSION:
        logger.debug_once(
            "tuned-config file %s has schema %r != %d; ignoring",
            str(path),
            payload.get("schema_version"),
            SCHEMA_VERSION,
        )
        return []
    entries = payload.get("entries")
    return entries if isinstance(entries, list) else []


@lru_cache(maxsize=8)
def _load_entries_cached(device_kind: str, dirs_key: tuple[str, ...]) -> tuple[dict[str, Any], ...]:
    entries: list[dict[str, Any]] = []
    for d in dirs_key:
        path = _config_path(Path(d), device_kind)
        if path.exists():
            entries.extend(_load_file(path))
    return tuple(entries)


def clear_lookup_cache() -> None:
    _load_entries_cached.cache_clear()


def _entries_for_device(device_kind: Optional[str] = None) -> tuple[dict[str, Any], ...]:
    kind = device_kind or current_device_kind()
    return _load_entries_cached(kind, tuple(str(d) for d in config_dirs()))


def _entry_config(entry: dict[str, Any]) -> Optional[BlockConfig]:
    cfg = entry.get("config")
    if not isinstance(cfg, dict):
        return None
    kwargs = {
        k: (bool(cfg[k]) if k in _BOOL_CONFIG_FIELDS else int(cfg[k]))
        for k in _CONFIG_FIELDS
        if k in cfg
    }
    try:
        return BlockConfig(**kwargs)
    except (TypeError, ValueError):
        return None


def lookup_tuned_config(
    *,
    direction: str,
    d: int,
    dv: Optional[int] = None,
    nq: int,
    nkv: int,
    dtype: str,
    causal: bool,
    has_bias: bool,
    dropout: bool,
    gqa: bool,
    group: int = 0,
    device_kind: Optional[str] = None,
) -> Optional[BlockConfig]:
    """Best-entry lookup. Returns None when no usable entry exists.

    Selection order (reference _persistent_autotune.py:503-725):
    1. filter: direction + exact feature flags; dtype exact, with bfloat16
       entries acceptable for float16 queries;
    2. nearest headdim;
    3. smallest seqlen bucket >= requested (per axis), else the largest.
    """
    if ENV.skip_persistent_tuned_config():
        return None
    dv = dv if dv is not None else d
    entries = _entries_for_device(device_kind)
    if not entries:
        return None

    def flag_ok(e: dict[str, Any]) -> bool:
        k = e.get("key", {})
        if k.get("direction") != direction:
            return False
        if bool(k.get("causal")) != causal or bool(k.get("has_bias")) != has_bias:
            return False
        if bool(k.get("dropout")) != dropout:
            return False
        edt = k.get("dtype")
        if edt == dtype:
            return True
        return dtype == "float16" and edt == "bfloat16"

    candidates = [e for e in entries if flag_ok(e)]
    if not candidates:
        return None

    # Nearest headdim.
    def hd_dist(e: dict[str, Any]) -> int:
        k = e.get("key", {})
        return abs(int(k.get("headdim", 0)) - d) + abs(
            int(k.get("headdim_v", k.get("headdim", 0))) - dv
        )

    best_hd = min(hd_dist(e) for e in candidates)
    candidates = [e for e in candidates if hd_dist(e) == best_hd]

    # Upper-or-max seqlen bucket per axis, preferring exact dtype.
    def seq_rank(e: dict[str, Any]) -> tuple:
        k = e.get("key", {})
        sq, sk = int(k.get("seqlen_q", 0)), int(k.get("seqlen_k", 0))
        over_q = sq >= nq
        over_k = sk >= nkv
        exact_dtype = k.get("dtype") == dtype
        return (
            not (over_q and over_k),  # prefer covering buckets
            abs(sq - nq) + abs(sk - nkv),
            # Head layout is a soft RANK, never a filter (reference
            # _persistent_autotune.py:503-527): an MHA-tuned block config is
            # valid (if suboptimal) for grouped-KV calls, so a GQA query
            # with no GQA entries must not fall off the store entirely
            # (the bundled decode corpus is gqa=false; a hard filter sent
            # every grouped decode to the hard-coded default block).
            bool(k.get("gqa", False)) != gqa,
            abs(int(k.get("group", 0) or 0) - group),
            not exact_dtype,
        )

    best = min(candidates, key=seq_rank)
    cfg = _entry_config(best)
    if cfg is None:
        return None
    logger.debug_once(
        "tuned-config hit: %s d=%d n=(%d,%d) -> %s",
        direction,
        d,
        nq,
        nkv,
        cfg,
    )
    return cfg


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------


def build_payload(entries: list[dict[str, Any]], device_kind: str) -> dict[str, Any]:
    import jax

    return {
        "schema_version": SCHEMA_VERSION,
        "device_kind": device_kind,
        "jax_version": jax.__version__,
        "entries": entries,
    }


def make_entry(key: ConfigKey, config: BlockConfig, ms: Optional[float] = None) -> dict[str, Any]:
    entry: dict[str, Any] = {
        "key": key.to_json(),
        "config": {f: getattr(config, f) for f in _CONFIG_FIELDS},
    }
    if ms is not None:
        entry["ms"] = ms
    return entry


def merge_entries(
    old: list[dict[str, Any]], new: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    """Dedup by full variant key; newer entries win (reference
    autotune.py:808-830).

    Keys are canonicalized through ConfigKey's dataclass defaults before
    comparison, so entries written under an older schema (e.g. missing the
    ``group`` field) dedup against a re-tune of the same variant instead of
    accumulating as shadow duplicates that could win lookup ties.
    """
    defaults = {
        f.name: f.default for f in fields(ConfigKey) if f.default is not MISSING
    }

    def canon(k: dict[str, Any]) -> str:
        return json.dumps({**defaults, **k}, sort_keys=True)

    by_key: dict[str, dict[str, Any]] = {}
    for e in list(old) + list(new):
        by_key[canon(e.get("key", {}))] = e
    return list(by_key.values())


def write_config_file(
    entries: list[dict[str, Any]],
    device_kind: Optional[str] = None,
    directory: Optional[str] = None,
    overwrite: bool = False,
) -> Path:
    """Locked read-merge-write of the device config file.

    Concurrency-safe across autotune worker processes via the native
    (C++/flock) locked store (utils/native.py) — the analog of the
    reference's fcntl-locked artifact cache (cute/utils/cache_utils.py).
    """
    from ..utils.native import LockedStore

    kind = device_kind or current_device_kind()
    dir_ = Path(directory) if directory else (
        Path(ENV.tuned_config_dir()) if ENV.tuned_config_dir() else _BUNDLED_DIR
    )
    dir_.mkdir(parents=True, exist_ok=True)
    path = _config_path(dir_, kind)
    with LockedStore(path) as store:
        # ALWAYS read-merge: ``overwrite`` only decides who wins duplicate
        # keys (True: the new entries; False: the existing file). A
        # whole-file replace would destroy every previously tuned entry on
        # each incremental write — exactly what a sweep must never do.
        existing = store.read_text()
        if existing is not None:
            try:
                payload = json.loads(existing)
                if (
                    isinstance(payload, dict)
                    and payload.get("schema_version") == SCHEMA_VERSION
                ):
                    old = payload.get("entries", [])
                    entries = (
                        merge_entries(old, entries)
                        if overwrite
                        else merge_entries(entries, old)
                    )
            except json.JSONDecodeError:
                pass
        payload = build_payload(entries, kind)
        store.write_text_atomic(json.dumps(payload, indent=1, sort_keys=True))
    clear_lookup_cache()
    return path
