"""Multiprocess autotune engine — the TPU analog of the Ray actor pool.

Reference analog: ray/_autotune_engine.py:54-142 (one actor per GPU,
fill-then-drain scheduling, per-task failure tolerated with a warning) and
ray/_autotune_worker.py:34-121 (per-worker device pinning + isolated JIT
cache dirs). On TPU, a chip is owned by one process, so the pool is plain
``multiprocessing`` with each worker pinned to one local device via
``TPU_VISIBLE_DEVICES`` / ``JAX_PLATFORMS`` inheritance, and per-worker
JAX compilation-cache isolation.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import tempfile
import time
import traceback
from typing import Any

from ..logger import init_logger

logger = init_logger(__name__)


def _worker_init(device_index: int) -> None:
    """Pin this worker process to one local device and isolate caches
    (reference worker pins device 0 of its visible set and isolates
    TRITON_CACHE_DIR, _autotune_worker.py:46-52)."""
    os.environ["TPU_VISIBLE_DEVICES"] = str(device_index)
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), f"ffpa_tpu_jit_cache_{device_index}"),
    )


def _worker_run(args: tuple) -> dict[str, Any] | None:
    device_index, task, mode = args
    _worker_init(device_index)
    from .cli import run_task  # deferred import after env pinning

    return run_task(task, mode)


def run_multiprocess_autotune(tasks, args) -> list[dict[str, Any]]:
    """Fill-then-drain over a per-device process pool; failures logged and
    skipped, never retried (reference ray/_autotune_engine.py:107-113)."""
    num_workers = args.num_workers
    ctx = mp.get_context("spawn")
    entries: list[dict[str, Any]] = []
    t_start = time.time()

    with ctx.Pool(processes=num_workers) as pool:
        jobs = [
            (i % num_workers, task, args.mode) for i, task in enumerate(tasks)
        ]
        for i, result in enumerate(
            pool.imap_unordered(_safe_worker_run, jobs)
        ):
            if isinstance(result, str):
                logger.warning("autotune task failed: %s", result[:300])
                continue
            if result is not None:
                entries.append(result)
                logger.info(
                    "[AUTOTUNED][%d/%d] %s t=%.1fs",
                    i + 1,
                    len(tasks),
                    result.get("key", {}),
                    time.time() - t_start,
                )
    return entries


def _safe_worker_run(args):
    try:
        return _worker_run(args)
    except Exception:
        return traceback.format_exc()
