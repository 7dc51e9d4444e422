"""FFPA-TPU: Faster Flash Prefill Attention for large head dims, TPU-native.

A from-scratch JAX / Pallas / pjit re-design of xlite-dev/ffpa-attn
(reference mounted read-only; see SURVEY.md): exact scaled-dot-product
attention for head dims 320..1024, forward + backward, with GQA/MQA,
tail-aligned causal masking, additive/boolean masks, deterministic dropout,
decode and varlen paths, persistent autotune, and multi-chip scaling via
head-sharded tensor parallelism and sequence-sharded ring attention.

Package exports mirror reference src/ffpa_attn/__init__.py:1-14.
"""

from .functional import (
    Backend,
    FFPAAttnMeta,
    PallasBackend,
    SDPABackend,
)
from .interface import (
    ffpa_attn_func,
    ffpa_attn_varlen_func,
    patch_dot_product_attention,
    unpatch_dot_product_attention,
)
from .ops.paged import (
    PageAllocator,
    PagedKVCache,
    append_token,
    assign_sequence,
    fill_from_prefill,
    paged_decode_attention,
)
from .version import __version__

__all__ = [
    "ffpa_attn_func",
    "ffpa_attn_varlen_func",
    "patch_dot_product_attention",
    "unpatch_dot_product_attention",
    "Backend",
    "SDPABackend",
    "PallasBackend",
    "FFPAAttnMeta",
    "PageAllocator",
    "PagedKVCache",
    "append_token",
    "assign_sequence",
    "fill_from_prefill",
    "paged_decode_attention",
    "__version__",
]
