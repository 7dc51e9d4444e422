"""Multi-chip parallelism: head-sharded TP + sequence-sharded ring attention.

The reference is a single-GPU kernel library (SURVEY.md §2.8); this package
supplies the TPU-native scaling tier required by BASELINE.json: shard_map
wrappers whose collectives (ppermute / psum) compile onto ICI.
"""

from .analysis import ring_scaling_projection, two_host_report
from .mesh import initialize_distributed, make_mesh
from .ring import ring_attention, ring_attention_sharded
from .tp import head_parallel_attention, paged_head_parallel_decode
from .ulysses import ulysses_attention, ulysses_attention_sharded
from .window import window_attention, window_attention_sharded
from .zigzag import zigzag_ring_attention_sharded

__all__ = [
    "window_attention",
    "window_attention_sharded",
    "ring_scaling_projection",
    "two_host_report",
    "initialize_distributed",
    "make_mesh",
    "ring_attention",
    "ring_attention_sharded",
    "head_parallel_attention",
    "paged_head_parallel_decode",
    "ulysses_attention",
    "ulysses_attention_sharded",
    "zigzag_ring_attention_sharded",
]
