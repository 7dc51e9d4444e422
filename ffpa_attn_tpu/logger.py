"""FFPA-TPU logging.

TPU-native re-design of the reference logger (reference:
src/ffpa_attn/logger.py:62-163): package-root "FFPA_TPU" logger with an
env-controlled level, a multi-line prefix formatter, ``*_once`` dedup
helpers, and an optional process-0-only filter for multi-host JAX runs
(the reference filters on torch.distributed rank; we use
``jax.process_index`` lazily so importing this module never initializes
the JAX runtime).
"""

from __future__ import annotations

import logging
import os
import sys
from functools import lru_cache
from typing import Any

_FORMAT = "%(levelname)s %(asctime)s [%(name)s] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"

_ROOT_NAME = "FFPA_TPU"


class _MultilineFormatter(logging.Formatter):
    """Prefix every line of a multi-line message, like the reference formatter."""

    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if "\n" not in msg:
            return msg
        head, *rest = msg.split("\n")
        prefix = head[: len(head) - len(record.getMessage().split("\n")[0])]
        return "\n".join([head] + [prefix + line for line in rest])


class _Process0Filter(logging.Filter):
    """Suppress non-primary-host logs when FFPA_TPU_FORCE_ONLY_RANK0_LOGGING=1."""

    def filter(self, record: logging.LogRecord) -> bool:
        if os.environ.get("FFPA_TPU_FORCE_ONLY_RANK0_LOGGING", "0") != "1":
            return True
        try:
            import jax

            return jax.process_index() == 0
        except Exception:
            return True


def _level_from_env() -> int:
    name = os.environ.get("FFPA_TPU_LOGGER_LEVEL", "INFO").upper()
    return getattr(logging, name, logging.INFO)


@lru_cache(maxsize=None)
def _root_logger() -> logging.Logger:
    logger = logging.getLogger(_ROOT_NAME)
    logger.setLevel(_level_from_env())
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(_MultilineFormatter(_FORMAT, datefmt=_DATEFMT))
    handler.addFilter(_Process0Filter())
    logger.addHandler(handler)
    logger.propagate = False
    return logger


_ONCE_SEEN: set[tuple[str, str]] = set()


def _log_once(logger: logging.Logger, level: int, msg: str, *args: Any) -> None:
    key = (logger.name, msg % args if args else msg)
    if key in _ONCE_SEEN:
        return
    _ONCE_SEEN.add(key)
    logger.log(level, msg, *args)


def init_logger(name: str) -> logging.Logger:
    """Return a child logger with injected ``info_once``/``debug_once``/``warning_once``.

    Mirrors the reference's injected-method pattern (logger.py:125-163).
    """
    _root_logger()
    logger = logging.getLogger(f"{_ROOT_NAME}.{name}")
    logger.setLevel(_level_from_env())

    # Inject *_once helpers (bound via default-arg closure).
    logger.info_once = lambda msg, *a, _l=logger: _log_once(_l, logging.INFO, msg, *a)  # type: ignore[attr-defined]
    logger.debug_once = lambda msg, *a, _l=logger: _log_once(_l, logging.DEBUG, msg, *a)  # type: ignore[attr-defined]
    logger.warning_once = lambda msg, *a, _l=logger: _log_once(_l, logging.WARNING, msg, *a)  # type: ignore[attr-defined]
    return logger


def reset_once_cache() -> None:
    """Test hook: clear the ``*_once`` dedup cache."""
    _ONCE_SEEN.clear()
