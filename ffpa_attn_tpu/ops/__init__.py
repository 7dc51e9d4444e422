"""FFPA-TPU kernel ops: Pallas forward/backward/decode/varlen + reference."""

from .config import BlockConfig, default_config
from .reference import reference_attention

__all__ = ["BlockConfig", "default_config", "reference_attention"]
