"""ctypes bindings for the native C++ IO library (native/segtpu_io.cc).

Builds the shared library on first use (g++, no external deps) and exposes
``native_decode_gray`` / ``native_decode_batch``. Every entry point degrades
gracefully to the PIL path in segtpu/data/io.py when the library is missing,
the build fails, or a file uses an unsupported TIFF variant.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_ROOT, "native", "libsegtpu_io.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        if not os.path.exists(_SO):
            subprocess.run(["make", "-C", os.path.dirname(_SO)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.segtpu_decode_gray.restype = ctypes.c_int
        lib.segtpu_decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.segtpu_decode_batch.restype = None
        lib.segtpu_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


_MAX_BYTES = 64 * 1024 * 1024  # 8k × 8k gray cap per image


def native_available() -> bool:
    return _load() is not None


def native_decode_gray(path: str) -> Optional[np.ndarray]:
    """Decode one grayscale TIFF natively; None → caller falls back."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(_MAX_BYTES, np.uint8)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = lib.segtpu_decode_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _MAX_BYTES, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


def native_decode_batch(paths: List[str], n_threads: int = 4
                        ) -> List[Optional[np.ndarray]]:
    """Thread-pooled batch decode; per-image None on unsupported files."""
    lib = _load()
    if lib is None:
        return [None] * len(paths)
    n = len(paths)
    if n == 0:
        return []
    out = np.empty((n, _MAX_BYTES), np.uint8)
    dims = np.zeros(2 * n, np.int32)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.segtpu_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _MAX_BYTES, dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    results: List[Optional[np.ndarray]] = []
    for i in range(n):
        if status[i] != 0:
            results.append(None)
            continue
        hh, ww = int(dims[2 * i]), int(dims[2 * i + 1])
        results.append(out[i, : hh * ww].reshape(hh, ww).copy())
    return results
