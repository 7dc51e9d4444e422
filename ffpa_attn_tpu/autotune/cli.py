"""Autotune CLI: sweep the task grid, harvest best block configs, persist.

Reference analog: ``python -m ffpa_attn.autotune`` (reference:
src/ffpa_attn/autotune.py:72-1151): a TuneTask grid over
D x (Nq, Nkv) x causal x dtype x direction, ``--full-tasks`` adding
attn-mask / dropout / GQA variants, results merged (dedup by variant key)
into the device-kind JSON. The Ray engine maps to a per-device multiprocess
pool (autotune/engine.py) since TPU chips are per-process resources.
"""

from __future__ import annotations

import argparse
import time
from dataclasses import dataclass
from typing import Optional

from ..logger import init_logger

logger = init_logger(__name__)

DEFAULT_HEADDIMS = (320, 512, 640, 768, 1024)
DEFAULT_SEQLENS = (1024, 2048, 4096, 8192, 16384)


@dataclass(frozen=True)
class TuneTask:
    """One autotune case (reference TuneTask, autotune.py:72)."""

    direction: str  # 'fwd' | 'bwd'
    d: int
    nq: int
    nkv: int
    dtype: str
    causal: bool
    has_bias: bool = False
    dropout: bool = False
    gqa: bool = False  # Hkv = H // 4
    mqa: bool = False  # Hkv = 1 (reference --full-tasks MQA variant)
    b: int = 1
    h: int = 8

    @property
    def hkv(self) -> int:
        if self.mqa:
            return 1
        if self.gqa:
            return max(self.h // 4, 1)
        return self.h

    @property
    def group(self) -> int:
        g = self.h // self.hkv
        return g if g > 1 else 0


def iter_tasks(args) -> list[TuneTask]:
    tasks: list[TuneTask] = []
    for direction in args.directions:
        for dtype in args.dtypes:
            for d in args.headdims:
                if direction in ("decode", "varlen"):
                    # Decode: Nq=1 vs each KV length (block_kv only);
                    # varlen: packed total T per seqlen (tile-shape pair).
                    # Keyed causal=False in the store either way (tile
                    # shape is not causal-sensitive for these kernels;
                    # varlen is TIMED causal, matching its dominant use).
                    for n in args.seqlens:
                        tasks.append(
                            TuneTask(
                                direction, d, 1 if direction == "decode" else n,
                                n, dtype, False,
                                b=args.B, h=args.H,
                            )
                        )
                        if args.full_tasks and direction == "decode":
                            # PackGQA decode folds the head group into the
                            # Q-row tile, changing the KV-block trade-off
                            # (ops/decode.py:160-173) — tune it separately.
                            tasks.append(
                                TuneTask(
                                    direction, d, 1, n, dtype, False,
                                    gqa=True, b=args.B, h=args.H,
                                )
                            )
                    continue
                if args.cross_tasks:
                    # Short-Nq cross-attention (Nq = Nkv // 8, the bench's
                    # cross case): tile shapes differ from self-attn — the
                    # dS/S slabs are 8x smaller so the S-resident backward
                    # always fits, and short Q favors wide KV owner tiles.
                    for n in args.seqlens:
                        nq_c = n // 8
                        if nq_c < 128:
                            continue
                        tasks.append(
                            TuneTask(
                                direction, d, nq_c, n, dtype, False,
                                b=args.B, h=args.H,
                            )
                        )
                for n in args.seqlens:
                    # Prune shapes that exceed HBM (reference prunes <48GB
                    # VRAM, autotune.py:138-144) — v5e has 16GB.
                    qkv_bytes = 4 * args.B * args.H * n * d * 2
                    if qkv_bytes > 8 * 1024**3:
                        continue
                    for causal in (False, True):
                        tasks.append(
                            TuneTask(
                                direction, d, n, n, dtype, causal,
                                b=args.B, h=args.H,
                            )
                        )
                        if args.full_tasks and not causal:
                            tasks.append(
                                TuneTask(
                                    direction, d, n, n, dtype, False,
                                    has_bias=True, b=args.B, h=args.H,
                                )
                            )
                            tasks.append(
                                TuneTask(
                                    direction, d, n, n, dtype, False,
                                    dropout=True, b=args.B, h=args.H,
                                )
                            )
                            tasks.append(
                                TuneTask(
                                    direction, d, n, n, dtype, False,
                                    gqa=True, b=args.B, h=args.H,
                                )
                            )
                            tasks.append(
                                TuneTask(
                                    direction, d, n, n, dtype, False,
                                    mqa=True, b=args.B, h=args.H,
                                )
                            )
    return tasks


def run_task(task: TuneTask, mode: str):
    """Tune one task on the current process's device. Returns an entry dict
    or None."""
    import jax
    import jax.numpy as jnp

    from .search import autotune_backward, autotune_forward
    from .store import ConfigKey, make_entry

    dtype = jnp.dtype(task.dtype)
    hkv = task.hkv
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (task.b, task.h, task.nq, task.d), dtype=dtype)
    k = jax.random.normal(kk, (task.b, hkv, task.nkv, task.d), dtype=dtype)
    v = jax.random.normal(kv, (task.b, hkv, task.nkv, task.d), dtype=dtype)
    bias = None
    if task.has_bias:
        bias = jax.random.normal(
            kb, (task.b, task.h, task.nq, task.nkv), dtype=jnp.float32
        )
    scale = 1.0 / (task.d ** 0.5)
    dropout_p = 0.1 if task.dropout else 0.0

    if task.direction == "decode":
        from .search import autotune_decode

        cfg, ms = autotune_decode(q, k, v, scale=scale, mode=mode)
    elif task.direction == "varlen":
        import jax.numpy as jnp2

        from .search import autotune_varlen

        # Representative mixed-length packing: 4 segments of T/4.
        t = task.nkv
        cu = jnp2.asarray(
            [0, t // 4, t // 2, 3 * t // 4, t], jnp2.int32
        )
        q3 = jnp2.swapaxes(q[0], 0, 1)[:t]
        k3 = jnp2.swapaxes(k[0], 0, 1)[:t]
        v3 = jnp2.swapaxes(v[0], 0, 1)[:t]
        cfg, ms = autotune_varlen(
            q3, k3, v3, cu, t // 4, scale=scale, mode=mode
        )
    else:
        tune = (
            autotune_forward if task.direction == "fwd" else autotune_backward
        )
        cfg, ms = tune(
            q, k, v, bias, scale=scale, is_causal=task.causal,
            dropout_p=dropout_p, mode=mode,
        )
    if cfg is None:
        return None
    return make_entry(task_key(task), cfg, ms=ms)


def task_key(task: TuneTask):
    """The store key a task's tuned entry lands under (shared by
    ``run_task`` and the ``--skip-stored`` resume filter)."""
    from .store import ConfigKey

    return ConfigKey(
        direction=task.direction,
        dtype=task.dtype,
        headdim=task.d,
        headdim_v=task.d,
        seqlen_q=task.nq,
        seqlen_k=task.nkv,
        causal=task.causal,
        has_bias=task.has_bias,
        dropout=task.dropout,
        gqa=task.gqa or task.mqa,
        group=task.group,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m ffpa_attn_tpu.autotune",
        description="FFPA-TPU persistent autotune",
    )
    parser.add_argument("--mode", choices=["fast", "max"], default="fast")
    parser.add_argument(
        "--directions", nargs="*", default=["fwd", "bwd"],
        choices=["fwd", "bwd", "decode", "varlen"],
    )
    parser.add_argument(
        "--dtypes", nargs="*", default=["bfloat16"],
        choices=["bfloat16", "float16"],
    )
    parser.add_argument("--headdims", type=int, nargs="*", default=list(DEFAULT_HEADDIMS))
    parser.add_argument("--seqlens", type=int, nargs="*", default=list(DEFAULT_SEQLENS))
    parser.add_argument("--B", type=int, default=1)
    parser.add_argument("--H", type=int, default=8)
    parser.add_argument("--full-tasks", action="store_true")
    parser.add_argument(
        "--cross-tasks", action="store_true",
        help="add short-Nq cross-attention tasks (Nq = Nkv // 8)",
    )
    parser.add_argument(
        "--overwrite",
        action="store_true",
        help="deprecated no-op, kept for reference-CLI parity: freshly "
        "measured entries ALWAYS replace stored entries at their key "
        "(untouched keys are preserved either way)",
    )
    parser.add_argument(
        "--num-workers", type=int, default=1,
        help="parallel worker processes, one per local TPU device",
    )
    parser.add_argument(
        "--isolate-tasks", action="store_true",
        help="one subprocess per task with a hard deadline (a wedged "
        "remote compile then costs one kill, not the whole sweep); "
        "entries are merge-written to the store incrementally",
    )
    parser.add_argument("--output-dir", default=None)
    parser.add_argument(
        "--skip-stored", action="store_true",
        help="resume support: drop tasks whose exact store key already "
        "has a tuned entry (an interrupted sweep re-run measures only "
        "what it hasn't landed yet)",
    )
    args = parser.parse_args(argv)

    tasks = iter_tasks(args)
    if args.skip_stored:
        # Normalize raw key dicts through ConfigKey so pre-group-schema
        # entries (no "group" field) still match their task.
        from .store import ConfigKey, _entries_for_device

        field_names = set(ConfigKey.__dataclass_fields__)
        stored = set()
        for e in _entries_for_device():
            kd = e.get("key")
            if not isinstance(kd, dict):
                continue
            try:
                norm = ConfigKey(**{k: v for k, v in kd.items() if k in field_names})
            except TypeError:
                continue
            stored.add(tuple(sorted(norm.to_json().items())))
        before = len(tasks)
        tasks = [
            t for t in tasks
            if tuple(sorted(task_key(t).to_json().items())) not in stored
        ]
        logger.info(
            "--skip-stored: %d/%d tasks already have entries; %d to run",
            before - len(tasks), before, len(tasks),
        )
    logger.info("autotune: %d tasks, mode=%s", len(tasks), args.mode)

    if args.isolate_tasks:
        from .engine import run_isolated_autotune

        entries = run_isolated_autotune(tasks, args)
        logger.info("autotune finished: %d entries", len(entries))
        return 0
    if args.num_workers > 1:
        from .engine import run_multiprocess_autotune

        entries = run_multiprocess_autotune(tasks, args)
    else:
        entries = []
        t_start = time.time()
        for i, task in enumerate(tasks):
            t0 = time.time()
            try:
                entry = run_task(task, args.mode)
            except Exception as exc:
                logger.warning("task %s failed: %s", task, str(exc)[:200])
                continue
            if entry is not None:
                entries.append(entry)
                logger.info(
                    "[AUTOTUNED][%d/%d] %s d=%d n=%d causal=%s -> %s t=%.1fs",
                    i + 1,
                    len(tasks),
                    task.direction,
                    task.d,
                    task.nq,
                    task.causal,
                    entry["config"],
                    time.time() - t0,
                )
        logger.info(
            "autotune finished: %d entries in %.1fs",
            len(entries),
            time.time() - t_start,
        )

    from .store import write_config_file

    # Freshly measured entries always win their key collision (see
    # engine.py run_isolated_autotune) — --overwrite is NOT required for a
    # re-sweep to land; it remains accepted for reference-CLI parity.
    if not args.overwrite:
        logger.info(
            "note: freshly measured entries always replace stored entries "
            "at their key (--overwrite is a deprecated no-op)"
        )
    path = write_config_file(
        entries, directory=args.output_dir, overwrite=True
    )
    logger.info("wrote %s", path)
    return 0
