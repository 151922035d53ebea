"""ctypes bindings for the native passage store (csrc/passage_store.cpp).

The shared library is built on demand with ``make`` (g++ is in the image;
pybind11 is not, hence ctypes). Falls back cleanly: callers check
``native_available()`` and use the pure-Python offset map otherwise —
mirroring how the reference keeps a Python PassageManager beside its C++
index engines.
"""

from __future__ import annotations

import ctypes
import json
import logging
import os
import subprocess
import threading
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libpassage_store.so")
_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            from .native import ensure_built

            ensure_built("passage_store")
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
                FileNotFoundError, OSError) as e:
            logger.warning("native passage store build failed (%s); using Python fallback", e)
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("could not load %s: %s", _LIB_PATH, e)
            _build_failed = True
            return None
        lib.ps_build_index.restype = ctypes.c_longlong
        lib.ps_build_index.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.ps_open.restype = ctypes.c_void_p
        lib.ps_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.ps_count.restype = ctypes.c_longlong
        lib.ps_count.argtypes = [ctypes.c_void_p]
        lib.ps_get.restype = ctypes.c_uint64
        lib.ps_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p)]
        lib.ps_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def build_offset_index(jsonl_path: str, cidx_path: str) -> int:
    """Native single-pass offset-index build. -> passage count (-1 on error)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native passage store unavailable")
    return int(lib.ps_build_index(jsonl_path.encode(), cidx_path.encode()))


class NativePassageStore:
    """Zero-copy id -> passage lookups over an mmap'd jsonl."""

    def __init__(self, jsonl_path: str, cidx_path: Optional[str] = None):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native passage store unavailable")
        self._lib = lib
        cidx_path = cidx_path or jsonl_path.replace(".jsonl", ".cidx")
        if not os.path.exists(cidx_path):
            if build_offset_index(jsonl_path, cidx_path) < 0:
                raise RuntimeError(f"failed to index {jsonl_path}")
        self._handle = lib.ps_open(jsonl_path.encode(), cidx_path.encode())
        if not self._handle:
            raise RuntimeError(f"failed to open passage store {jsonl_path}")

    def __len__(self) -> int:
        return int(self._lib.ps_count(self._handle))

    def get_raw(self, pid: str) -> Optional[bytes]:
        ptr = ctypes.c_char_p()
        n = self._lib.ps_get(self._handle, pid.encode(), ctypes.byref(ptr))
        if n == 0:
            return None
        return ctypes.string_at(ptr, n)

    def get(self, pid: str) -> Optional[Dict[str, Any]]:
        raw = self.get_raw(pid)
        return json.loads(raw) if raw is not None else None

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.ps_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
