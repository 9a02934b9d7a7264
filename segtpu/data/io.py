"""Host-side image IO: grayscale TIFF decode (cached) + synthetic fixtures.

Decoding is the only host-side stage of the input pipeline; everything after
(resize, CLAHE, normalization, augmentation) runs on device. Decoded raw
arrays are cached by (path, mtime) so CV folds / experiment sweeps never
re-decode the same file — the reference re-reads and re-preprocesses every
image every epoch (dataset.py:44-66), one of its dominant costs.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

_DECODE_CACHE: Dict[Tuple[str, float], np.ndarray] = {}
_CACHE_MAX = 4096


def decode_gray(path: str) -> np.ndarray:
    """Decode an image file to a grayscale uint8 (H, W) array.

    Uses PIL (TIFF-capable, always present). Color inputs are converted with
    the ITU-R 601 luma transform (identical to cv2.IMREAD_GRAYSCALE).
    """
    key = (path, os.path.getmtime(path))
    hit = _DECODE_CACHE.get(key)
    if hit is not None:
        return hit
    # native C++ strip-TIFF fast path (native/segtpu_io.cc); PIL fallback
    try:
        from segtpu.data.native import native_decode_gray
        arr = native_decode_gray(path)
        if arr is not None:
            if len(_DECODE_CACHE) >= _CACHE_MAX:
                _DECODE_CACHE.clear()
            _DECODE_CACHE[key] = arr
            return arr
    except Exception:
        pass
    return _decode_gray_pil(path, key)


def _decode_gray_pil(path: str, key: Tuple[str, float]) -> np.ndarray:
    """PIL decode branch (no native attempt) + cache insert."""
    from PIL import Image
    with Image.open(path) as im:
        if im.mode in ("I;16", "I;16B"):
            # cv2.IMREAD_GRAYSCALE (dataset.py:46) always maps 16-bit to
            # 8-bit by /256, regardless of the data's actual range — a dim
            # 16-bit image must stay dim, so scale unconditionally.
            arr = np.asarray(im, dtype=np.float32)
            arr = np.clip(arr / 256.0, 0, 255).astype(np.uint8)
        elif im.mode == "I":
            # 32-bit container: scale by the observed bit depth (16-bit
            # data stored as mode "I" is common for TIFF).
            arr = np.asarray(im, dtype=np.float32)
            arr = np.clip(arr / 256.0 if arr.max() > 255 else arr, 0, 255)
            arr = arr.astype(np.uint8)
        else:
            arr = np.asarray(im.convert("L"))
    if len(_DECODE_CACHE) >= _CACHE_MAX:
        _DECODE_CACHE.clear()
    _DECODE_CACHE[key] = arr
    return arr


def decode_gray_batch(paths: List[str], n_threads: int = 4
                      ) -> List[np.ndarray]:
    """Batch decode with the native thread pool (native/segtpu_io.cc).

    Cache-aware: already-decoded files are served from the cache; the
    remainder go through one ``segtpu_decode_batch`` call (pthread pool —
    overlaps file IO even on this 1-core host); unsupported variants fall
    back to the PIL path per file. Result order matches ``paths``."""
    keys = []
    for p in paths:
        try:
            keys.append((p, os.path.getmtime(p)))
        except OSError:
            keys.append((p, -1.0))
    out: List = [None] * len(paths)
    miss_idx = []
    for i, k in enumerate(keys):
        hit = _DECODE_CACHE.get(k)
        if hit is not None:
            out[i] = hit
        else:
            miss_idx.append(i)
    if miss_idx:
        native_results = None
        try:
            from segtpu.data.native import native_decode_batch
            native_results = native_decode_batch(
                [paths[i] for i in miss_idx], n_threads=n_threads)
        except Exception:
            native_results = [None] * len(miss_idx)
        for j, i in enumerate(miss_idx):
            arr = native_results[j] if native_results else None
            if arr is None:
                # The batch call already established native can't decode
                # this file — go straight to PIL (no second native probe
                # + decode attempt per file).
                arr = _decode_gray_pil(paths[i], keys[i])
            else:
                if len(_DECODE_CACHE) >= _CACHE_MAX:
                    _DECODE_CACHE.clear()
                _DECODE_CACHE[keys[i]] = arr
            out[i] = arr
    return out


def write_tiff(path: str, arr: np.ndarray) -> bool:
    """Write a uint8 grayscale array as TIFF. Returns success."""
    try:
        from PIL import Image
        Image.fromarray(np.asarray(arr, dtype=np.uint8)).save(path)
        return True
    except Exception:
        return False


def clear_decode_cache() -> None:
    _DECODE_CACHE.clear()


def make_synthetic_dataset(root: str, n_images: int = 12, image_type: str = "W",
                           raw_size: Tuple[int, int] = (160, 192),
                           seed: int = 0) -> str:
    """Generate a tiny synthetic cell-microscopy dataset following the
    reference's naming contract (``*_GT.tif`` masks, modality char at
    ``parts[3][1]``; dataset.py:92-111) so CV / experiment drivers run
    end-to-end without real data (SURVEY.md §4d).

    Images contain bright blobs on a noisy background; masks are the blob
    supports. Returns ``root`` (which then works as ``data_dir``).
    """
    rng = np.random.default_rng(seed)
    images_dir = os.path.join(root, "Labelled_images")
    masks_dir = os.path.join(root, "GT_masks")
    os.makedirs(images_dir, exist_ok=True)
    os.makedirs(masks_dir, exist_ok=True)

    h, w = raw_size
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_images):
        img = rng.normal(70, 12, (h, w))
        mask = np.zeros((h, w), bool)
        for _ in range(rng.integers(2, 6)):
            cy, cx = rng.integers(10, h - 10), rng.integers(10, w - 10)
            ry, rx = rng.integers(6, 18), rng.integers(6, 18)
            blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            img[blob] += rng.uniform(60, 120)
            mask |= blob
        img = np.clip(img, 0, 255).astype(np.uint8)
        # Name shape: Img_A_B_1W_<i>.tif → parts[3][1] == 'W'
        stem = f"Img_A_B_1{image_type}_{i:03d}"
        write_tiff(os.path.join(images_dir, f"{stem}.tif"), img)
        write_tiff(os.path.join(masks_dir, f"{stem}_GT.tif"),
                   mask.astype(np.uint8) * 255)
    return root
