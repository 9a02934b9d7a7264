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
        lib.segtpu_probe_gray.restype = ctypes.c_int
        lib.segtpu_probe_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.segtpu_decode_batch_at.restype = None
        lib.segtpu_decode_batch_at.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB




def native_available() -> bool:
    return _load() is not None


def native_decode_gray(path: str) -> Optional[np.ndarray]:
    """Decode one grayscale TIFF natively; None → caller falls back."""
    lib = _load()
    if lib is None:
        return None
    probe = native_probe(path)
    if probe is None:
        return None
    hh, ww = probe
    buf = np.empty(hh * ww, np.uint8)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = lib.segtpu_decode_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        hh * ww, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value)


def native_probe(path: str) -> Optional[Tuple[int, int]]:
    """Header-only probe: (H, W) if the file is a supported TIFF."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    if lib.segtpu_probe_gray(path.encode(), ctypes.byref(w),
                             ctypes.byref(h)) != 0:
        return None
    return int(h.value), int(w.value)


# Aggregate output-buffer budget for one native_decode_batch call. Header
# dims are attacker/corruption-controlled (up to kMaxPixels = 512 MB per
# image), so an unbounded sum could demand a multi-GB np.empty that the
# kernel overcommits and the OOM killer later reaps. Batches whose probed
# total exceeds this are decoded in budget-sized chunks instead.
_BATCH_BUDGET_BYTES = int(os.environ.get(
    "SEGTPU_DECODE_BATCH_BUDGET", 1 << 30))


def native_decode_batch(paths: List[str], n_threads: int = 4
                        ) -> List[Optional[np.ndarray]]:
    """Thread-pooled batch decode; per-image None on unsupported files.

    Two-phase: cheap header probes size every image, then ONE exact-sized
    output allocation is filled by the pthread pool (the previous fixed
    64 MB/image buffer cost more in page faults than the decode itself).
    The single allocation is capped at ``_BATCH_BUDGET_BYTES``; larger
    batches are split into budget-sized chunks."""
    lib = _load()
    if lib is None:
        return [None] * len(paths)
    n = len(paths)
    if n == 0:
        return []
    shapes = [native_probe(p) for p in paths]
    sizes = [s[0] * s[1] if s is not None else 0 for s in shapes]
    if sum(sizes) > _BATCH_BUDGET_BYTES and n > 1:
        results: List[Optional[np.ndarray]] = []
        start, acc = 0, 0
        for i, sz in enumerate(sizes):
            if acc and acc + sz > _BATCH_BUDGET_BYTES:
                results.extend(native_decode_batch(paths[start:i], n_threads))
                start, acc = i, 0
            acc += sz
        results.extend(native_decode_batch(paths[start:], n_threads))
        return results
    offsets = np.zeros(n, np.int64)
    total = 0
    for i, sz in enumerate(sizes):
        offsets[i] = total
        total += sz
    out = np.empty(max(total, 1), np.uint8)
    caps = np.asarray(sizes, np.int64)
    dims = np.zeros(2 * n, np.int32)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.segtpu_decode_batch_at(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    results: List[Optional[np.ndarray]] = []
    for i in range(n):
        if shapes[i] is None or status[i] != 0:
            results.append(None)
            continue
        hh, ww = int(dims[2 * i]), int(dims[2 * i + 1])
        start = int(offsets[i])
        results.append(out[start: start + hh * ww].reshape(hh, ww).copy())
    return results
