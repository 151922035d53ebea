"""ctypes binding for the native ASCII hash tokenizer (csrc/hash_tokenizer.cpp).

Bit-exact with the Python HashTokenizer on ASCII input (verified by tests);
non-ASCII texts stay on the Python path, so mixed batches split per text.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libhash_tokenizer.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            from .native import ensure_built

            ensure_built("hash_tokenizer")
        except Exception as e:
            logger.debug("native tokenizer build failed: %s", e)
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.debug("native tokenizer load failed: %s", e)
            _failed = True
            return None
        lib.tok_encode_batch_ascii.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_tokenizer_available() -> bool:
    return _load() is not None


def encode_batch_ascii(texts: Sequence[str], max_length: int, vocab_size: int
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Tokenize pure-ASCII ``texts`` natively -> (ids [N, L] i32, mask [N, L]
    i32), or None when the native library is unavailable. Caller guarantees
    every text ``isascii()``."""
    lib = _load()
    if lib is None:
        return None
    n = len(texts)
    enc = [t.encode("ascii") for t in texts]
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(e) for e in enc], out=offsets[1:])
    buf = b"".join(enc)
    ids = np.zeros((n, max_length), np.int32)
    lens = np.zeros(n, np.int32)
    lib.tok_encode_batch_ascii(
        buf,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int32(n), np.int32(max_length), np.int32(vocab_size),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    mask = (np.arange(max_length)[None, :] < lens[:, None]).astype(np.int32)
    return ids, mask
