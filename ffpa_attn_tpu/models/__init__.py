"""Model layer: a large-head-dim transformer LM built on FFPA attention.

The reference validates E2E with Gemma4-31B layers at D=512 under FSDP
(reference README.md:122); this package provides the equivalent flagship:
an FFPA-attention transformer with dp/tp/sp sharding for multi-chip runs.
"""

from .checkpoint import latest_step, restore_train_state, save_train_state
from .generate import decode_step, generate, init_kv_cache, prefill
from .speculative import speculative_generate
from .serving import pack_prompts, prefill_packed, serve_batch, serve_batch_paged
from .transformer import (
    ModelConfig,
    init_params,
    forward,
    loss_fn,
    make_train_step,
    shard_params,
)

__all__ = [
    "ModelConfig",
    "init_params",
    "forward",
    "loss_fn",
    "make_train_step",
    "shard_params",
    "init_kv_cache",
    "prefill",
    "decode_step",
    "generate",
    "pack_prompts",
    "prefill_packed",
    "serve_batch",
    "serve_batch_paged",
    "save_train_state",
    "restore_train_state",
    "latest_step",
    "speculative_generate",
]
