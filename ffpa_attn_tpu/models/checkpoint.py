"""Checkpoint / resume for the FFPA training tier (orbax-backed).

The reference is a stateless kernel library — its only persisted artifacts
are tuned-config JSONs and the compiled-kernel cache (SURVEY.md §5), both
of which FFPA-TPU also ships (autotune/store.py, the JAX compilation
cache). This module supplies the third leg a production TRAINING stack
needs and the reference has no story for: durable train-state
checkpointing with resume, built on orbax (the TPU-native checkpoint
library — async-friendly, multi-host-aware sharded saves via
jax.sharding metadata).

Design notes:

* State is the (params, opt_state, step) pytree exactly as the train loop
  holds it — no translation layer, so restore is bit-faithful and a
  resumed run continues the optimizer trajectory (moments included).
* ``CheckpointManager`` keeps ``max_to_keep`` steps and prunes older ones;
  saves are atomic (orbax writes to a temp dir and renames).
* Restore takes the abstract state template (from a freshly-initialized
  model) so dtypes/shapes/shardings are validated against the current
  config — a config/checkpoint mismatch fails loudly instead of loading
  garbage.
* Multi-host: orbax coordinates across processes through
  ``jax.distributed`` (parallel/mesh.initialize_distributed); each host
  writes its shards. Single-host needs nothing extra.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_train_state(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any,
    *,
    max_to_keep: int = 3,
    wait: bool = True,
) -> None:
    """Persist (params, opt_state) at ``step``; atomic, pruned history."""
    import orbax.checkpoint as ocp

    mngr = _manager(directory, max_to_keep)
    mngr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
        ),
    )
    if wait:
        mngr.wait_until_finished()
    mngr.close()


def latest_step(directory: str) -> Optional[int]:
    """Newest checkpointed step in ``directory``, or None."""
    import orbax.checkpoint as ocp

    mngr = _manager(directory)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_train_state(
    directory: str,
    params_template: Any,
    opt_state_template: Any,
    *,
    step: Optional[int] = None,
):
    """Restore (params, opt_state, step). Templates are live pytrees from a
    fresh ``init_params`` / ``optimizer.init`` — orbax validates structure,
    shape and dtype against them (and re-shards onto their shardings), so a
    stale checkpoint against a changed ModelConfig fails loudly."""
    import orbax.checkpoint as ocp

    mngr = _manager(directory)
    if step is None:
        step = mngr.latest_step()
    if step is None:
        mngr.close()
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    abstract = jax.tree.map(
        ocp.utils.to_shape_dtype_struct, (params_template, opt_state_template)
    )
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(abstract[0]),
            opt_state=ocp.args.StandardRestore(abstract[1]),
        ),
    )
    mngr.close()
    return restored["params"], restored["opt_state"], step


__all__ = ["save_train_state", "restore_train_state", "latest_step"]
