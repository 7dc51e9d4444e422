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
import queue as pyqueue
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


def _isolated_entry(task, mode, queue):  # pragma: no cover - subprocess
    try:
        from .cli import run_task

        queue.put(run_task(task, mode))
    except Exception:
        queue.put(traceback.format_exc())


def run_isolated_autotune(tasks, args) -> list[dict[str, Any]]:
    """One SUBPROCESS per task with a hard deadline.

    The remote-compile tunnel holds one session per process; a wedged
    Mosaic compile blocks every later claim until its process dies
    (observed: one pathological compile stalled the whole sweep and the
    chip with it). Process-per-task turns a hang into a bounded kill, and
    each finished entry is merge-written to the store immediately so hours
    of sweep survive a crash."""
    from .store import write_config_file

    ctx = mp.get_context("spawn")
    entries: list[dict[str, Any]] = []
    t_start = time.time()
    for i, task in enumerate(tasks):
        budget = 900 if max(task.nq, task.nkv) < 16384 else 2400
        # max-mode sweeps walk up to ~4x the fast candidate count; campaign
        # scripts can also override outright (FFPA_TPU_AUTOTUNE_TASK_BUDGET_S).
        if args.mode == "max":
            budget *= 2
        try:
            budget = int(os.environ.get("FFPA_TPU_AUTOTUNE_TASK_BUDGET_S") or budget)
        except ValueError:
            logger.warning(
                "ignoring non-integer FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=%r",
                os.environ["FFPA_TPU_AUTOTUNE_TASK_BUDGET_S"],
            )
        queue = ctx.Queue()
        proc = ctx.Process(target=_isolated_entry, args=(task, args.mode, queue))
        t0 = time.time()
        proc.start()
        proc.join(timeout=budget)
        if proc.is_alive():
            proc.kill()
            proc.join()
            logger.warning(
                "[AUTOTUNE][%d/%d] %s d=%d n=(%d,%d) exceeded %ds; killed",
                i + 1, len(tasks), task.direction, task.d, task.nq,
                task.nkv, budget,
            )
            continue
        # Queue.empty() is documented-unreliable (can transiently report
        # True right after the child exits, dropping a finished entry);
        # block briefly on get() instead.
        try:
            result = queue.get(timeout=5)
        except pyqueue.Empty:
            result = None
        if isinstance(result, str):
            logger.warning("autotune task failed: %s", result[:300])
            continue
        if result is not None:
            entries.append(result)
            # ALWAYS overwrite=True here: this entry was just MEASURED on
            # this chip; losing the key-collision merge to a stale entry
            # silently discards the whole sweep (round-4 bug: two max-mode
            # sweeps burned ~80 min of chip time and left the store
            # byte-identical). --overwrite retains its reference-CLI
            # meaning on the final bulk write (cli.py).
            write_config_file(
                [result], directory=args.output_dir, overwrite=True
            )
            logger.info(
                "[AUTOTUNED][%d/%d] %s d=%d n=%d causal=%s -> %s t=%.1fs "
                "(%.0fs total)",
                i + 1, len(tasks), task.direction, task.d, task.nkv,
                task.causal, result["config"], time.time() - t0,
                time.time() - t_start,
            )
    return entries
