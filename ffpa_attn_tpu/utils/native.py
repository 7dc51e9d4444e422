"""ctypes bindings for the native store library (csrc/ffpa_store.cc).

Loads (building on first use if a toolchain is present) the file-locked
atomic store; degrades gracefully to a pure-Python fcntl implementation
when no compiler is available — the reference's import-time degradation
pattern (reference: functional.py:27-42, cuda/__init__.py:6-25).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from pathlib import Path
from typing import Optional

from ..logger import init_logger

logger = init_logger(__name__)

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_NAME = "libffpa_store.so"


def build_native(force: bool = False) -> Optional[Path]:
    """Build the native lib with make/g++; None if the toolchain is absent."""
    lib = _CSRC / _LIB_NAME
    if lib.exists() and not force:
        return lib
    if not (_CSRC / "ffpa_store.cc").exists():
        return None
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.SubprocessError) as exc:
        logger.debug_once("native build unavailable: %s", str(exc)[:200])
        return None
    return lib if lib.exists() else None


@lru_cache(maxsize=1)
def load_native() -> Optional[ctypes.CDLL]:
    lib_path = build_native()
    if lib_path is None:
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError as exc:
        logger.debug_once("native load failed: %s", str(exc)[:200])
        return None
    lib.ffpa_store_lock.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ffpa_store_lock.restype = ctypes.c_int
    lib.ffpa_store_unlock.argtypes = [ctypes.c_int]
    lib.ffpa_store_unlock.restype = ctypes.c_int
    lib.ffpa_store_write_atomic.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    lib.ffpa_store_write_atomic.restype = ctypes.c_int
    lib.ffpa_store_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ffpa_store_read.restype = ctypes.c_int
    lib.ffpa_store_free.argtypes = [ctypes.c_char_p]
    lib.ffpa_store_version.restype = ctypes.c_int
    return lib


def native_available() -> bool:
    return load_native() is not None


class LockedStore:
    """File-locked atomic read/merge/write, native-backed when possible."""

    def __init__(self, path: os.PathLike | str, timeout_ms: int = 10_000):
        self.path = str(path)
        self.timeout_ms = timeout_ms
        self._lib = load_native()
        self._fd: Optional[int] = None

    # -- locking -----------------------------------------------------------
    def __enter__(self) -> "LockedStore":
        if self._lib is not None:
            fd = self._lib.ffpa_store_lock(
                self.path.encode(), ctypes.c_int(self.timeout_ms)
            )
            if fd < 0:
                raise TimeoutError(f"could not lock {self.path}")
            self._fd = fd
        else:
            import fcntl

            fd = os.open(self.path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
            fcntl.flock(fd, fcntl.LOCK_EX)
            self._fd = fd
        return self

    def __exit__(self, *exc) -> None:
        if self._fd is None:
            return
        if self._lib is not None:
            self._lib.ffpa_store_unlock(self._fd)
        else:
            import fcntl

            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
        self._fd = None

    # -- IO ------------------------------------------------------------------
    def read_text(self) -> Optional[str]:
        if self._lib is not None:
            out = ctypes.c_char_p()
            size = ctypes.c_int64()
            rc = self._lib.ffpa_store_read(
                self.path.encode(), ctypes.byref(out), ctypes.byref(size)
            )
            if rc == -1:
                return None
            if rc != 0:
                raise OSError(f"native read of {self.path} failed rc={rc}")
            try:
                return ctypes.string_at(out, size.value).decode()
            finally:
                self._lib.ffpa_store_free(out)
        try:
            with open(self.path) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def write_text_atomic(self, data: str) -> None:
        if self._lib is not None:
            raw = data.encode()
            rc = self._lib.ffpa_store_write_atomic(
                self.path.encode(), raw, ctypes.c_int64(len(raw))
            )
            if rc != 0:
                raise OSError(f"native atomic write of {self.path} failed rc={rc}")
            return
        import tempfile

        dir_ = os.path.dirname(self.path) or "."
        fd, tmp = tempfile.mkstemp(dir=dir_)
        try:
            with os.fdopen(fd, "w") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
