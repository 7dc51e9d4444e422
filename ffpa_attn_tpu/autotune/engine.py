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


def _worker_loop(task_q, result_q):  # pragma: no cover - subprocess
    """Reusable isolated worker: serve tasks until poisoned (None).

    Importing jax + opening the remote-compile tunnel costs ~15-25 s per
    process; one process per TASK paid it 40x in a 40-task sweep. Reuse
    keeps that warm-up once per worker LIFETIME while the parent retains
    the hang guarantee: a deadline overrun kills the process (taking the
    wedged compile with it) and the next task gets a fresh one."""
    from .cli import run_task

    while True:
        item = task_q.get()
        if item is None:
            return
        task, mode = item
        try:
            result_q.put(run_task(task, mode))
        except Exception:
            result_q.put(traceback.format_exc())


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

    # One REUSABLE worker (fresh queues per incarnation so a result that
    # lands exactly at a deadline can't be mis-attributed to the next
    # task). Recycled on deadline overrun, on worker death, and every
    # RECYCLE_AFTER tasks as a leak backstop — each recycle re-pays the
    # ~15-25 s jax+tunnel warm-up exactly once.
    RECYCLE_AFTER = 12
    worker = task_q = result_q = None
    served = 0

    def _spawn():
        nonlocal worker, task_q, result_q, served
        task_q, result_q = ctx.Queue(), ctx.Queue()
        worker = ctx.Process(
            target=_worker_loop, args=(task_q, result_q), daemon=True
        )
        worker.start()
        served = 0

    def _retire(kill: bool):
        nonlocal worker
        if worker is None:
            return
        if kill:
            worker.kill()
        else:
            task_q.put(None)
        worker.join(timeout=30)
        if worker.is_alive():
            worker.kill()
            worker.join()
        worker = None

    try:
        for i, task in enumerate(tasks):
            budget = 900 if max(task.nq, task.nkv) < 16384 else 2400
            # max-mode sweeps walk up to ~4x the fast candidate count;
            # campaign scripts can also override outright
            # (FFPA_TPU_AUTOTUNE_TASK_BUDGET_S).
            if args.mode == "max":
                budget *= 2
            try:
                override = int(
                    os.environ.get("FFPA_TPU_AUTOTUNE_TASK_BUDGET_S") or budget
                )
                if override > 0:
                    budget = override
                else:
                    # A non-positive budget would expire every deadline on
                    # arrival and silently kill the whole sweep task-by-task.
                    logger.warning(
                        "ignoring non-positive FFPA_TPU_AUTOTUNE_TASK_BUDGET_S"
                        "=%r (keeping computed budget %ds)", override, budget,
                    )
            except ValueError:
                logger.warning(
                    "ignoring non-integer FFPA_TPU_AUTOTUNE_TASK_BUDGET_S=%r",
                    os.environ["FFPA_TPU_AUTOTUNE_TASK_BUDGET_S"],
                )
            if worker is not None and served >= RECYCLE_AFTER:
                _retire(kill=False)
            if worker is None or not worker.is_alive():
                _spawn()
            t0 = time.time()
            task_q.put((task, args.mode))
            served += 1
            # Poll in short slices so a crashed worker fails the task in
            # seconds, not after the full budget.
            deadline = t0 + budget
            result = _PENDING = object()
            while time.time() < deadline:
                try:
                    result = result_q.get(timeout=min(5, max(0.1, deadline - time.time())))
                    break
                except pyqueue.Empty:
                    if not worker.is_alive():
                        break
            if result is _PENDING and not worker.is_alive():
                # The worker may have put its result in its dying breath
                # (Queue.empty/get raciness right after child exit).
                try:
                    result = result_q.get(timeout=5)
                except pyqueue.Empty:
                    pass
            if result is _PENDING:
                alive = worker.is_alive()
                _retire(kill=True)
                if alive:
                    logger.warning(
                        "[AUTOTUNE][%d/%d] %s d=%d n=(%d,%d) exceeded %ds; "
                        "killed", i + 1, len(tasks), task.direction, task.d,
                        task.nq, task.nkv, budget,
                    )
                else:
                    logger.warning(
                        "[AUTOTUNE][%d/%d] %s d=%d n=(%d,%d): worker died",
                        i + 1, len(tasks), task.direction, task.d, task.nq,
                        task.nkv,
                    )
                continue
            if isinstance(result, str):
                logger.warning("autotune task failed: %s", result[:300])
                # A failure can leave process-level state wedged (partial
                # jax caches, a half-open compile stream); start clean.
                _retire(kill=True)
                continue
            if result is not None:
                entries.append(result)
                # ALWAYS overwrite=True here: this entry was just MEASURED
                # on this chip; losing the key-collision merge to a stale
                # entry silently discards the whole sweep (round-4 bug: two
                # max-mode sweeps burned ~80 min of chip time and left the
                # store byte-identical). --overwrite retains its
                # reference-CLI meaning on the final bulk write (cli.py).
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
    finally:
        _retire(kill=False)
    return entries
