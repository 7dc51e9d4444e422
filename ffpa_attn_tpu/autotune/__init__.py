"""Persistent autotune: tuned-config store + timed block-shape search."""

from .store import (
    ConfigKey,
    clear_lookup_cache,
    lookup_tuned_config,
    write_config_file,
)

__all__ = [
    "ConfigKey",
    "clear_lookup_cache",
    "lookup_tuned_config",
    "write_config_file",
]
