"""Fused on-device preprocessing graph.

The reference's per-sample CPU chain (dataset.py:44-66):
    cv2.imread → cv2.resize(INTER_AREA / INTER_NEAREST)
    → percentile[2,98] clip → CLAHE(2.0, 8×8) → min-max normalize
    → binarize mask
is rebuilt as two stages:

1. ``load_canonical``  (host decode → one batched device resize per raw
   shape group): produces *canonical frames* — uint8 (N, S, S) images and
   binary uint8 masks at the target ``img_size``. Cached per
   (paths, img_size), computed once per experiment instead of once per
   epoch×sample.
2. ``normalize_canonical`` (jit, vmap): percentile clip → CLAHE → min-max,
   entirely on device, fused by XLA. ~bit-exact vs the reference chain
   (the resize rounds to uint8 exactly like cv2's fixed-point path ±1).

Augmentation (segtpu/data/augment.py) slots between the two stages,
operating on canonical uint8 frames.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.data.io import decode_gray, decode_gray_batch
from segtpu.ops.clahe import clahe
from segtpu.ops.resize import resize_area, resize_nearest


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """cv2-style round-half-up to uint8."""
    return jnp.floor(jnp.clip(x, 0, 255) + 0.5).astype(jnp.uint8)


@lru_cache(maxsize=64)
def _resize_pair_fn(raw_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    """Jitted batched (image INTER_AREA, mask INTER_NEAREST) resize for one
    raw shape group (dataset.py:50-51)."""

    @jax.jit
    def f(raw_imgs, raw_masks):
        imgs = jax.vmap(lambda im: _round_u8(resize_area(im, out_hw)))(raw_imgs)
        masks = jax.vmap(lambda m: resize_nearest(m, out_hw))(raw_masks)
        masks = (masks > 0).astype(jnp.uint8)
        return imgs, masks

    return f


@lru_cache(maxsize=64)
def _resize_img_fn(raw_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    @jax.jit
    def f(raw_imgs):
        return jax.vmap(lambda im: _round_u8(resize_area(im, out_hw)))(raw_imgs)
    return f


# Decode chunk size for the double-buffered pipeline. One producer thread
# runs the native decode (C, GIL released) for chunk k+1 while the main
# thread dispatches chunk k's device resize — decode and device work
# overlap even on this 1-core host because both sides spend their time
# outside the GIL (C decode / relay IO waits).
_PREFETCH_CHUNK = 64


def _decode_resize_pipelined(image_paths: Sequence[str],
                             mask_paths: Optional[Sequence[str]],
                             img_size: Tuple[int, int],
                             chunk: Optional[int]):
    """Shared chunked decode→resize pipeline (images-only or pairs).

    Producer thread: per chunk, one threaded native batch decode
    (PIL fallback per file). Main thread: group by raw shape, dispatch the
    jitted batched resize (async through the relay), KEEP device refs.
    Epilogue: ONE ``jax.device_get`` over every group's output — a single
    host↔device sync instead of one ~1 s relay RTT per shape group.

    Returns (imgs_out (N,S,S) u8, masks_out or None, raw_shapes (N,2) i32).
    """
    import queue as _queue
    import threading

    n = len(image_paths)
    pairs = mask_paths is not None
    imgs_out = np.zeros((n, *img_size), np.uint8)
    masks_out = np.zeros((n, *img_size), np.uint8) if pairs else None
    raw_shapes = np.zeros((n, 2), np.int32)
    if n == 0:
        return imgs_out, masks_out, raw_shapes
    chunk = n if not chunk or chunk <= 0 else min(chunk, n)

    q: "_queue.Queue" = _queue.Queue(maxsize=2)  # double buffer

    def producer():
        try:
            for s in range(0, n, chunk):
                idx = list(range(s, min(n, s + chunk)))
                ps = [image_paths[i] for i in idx]
                if pairs:
                    ps += [mask_paths[i] for i in idx]
                q.put((idx, decode_gray_batch(ps)))
            q.put(None)
        except BaseException as e:  # surface decode errors in the consumer
            q.put(e)

    th = threading.Thread(target=producer, daemon=True,
                          name="segtpu-decode-prefetch")
    th.start()

    pending = []  # (np index array, device imgs, device masks | None)
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            idx, decoded = item
            m = len(idx)
            groups: dict = {}
            for j, i in enumerate(idx):
                img = decoded[j]
                msk = decoded[m + j] if pairs else None
                if pairs and msk.shape != img.shape:
                    # defensive: masks should match raw images
                    msk = np.array(jax.device_get(
                        resize_nearest(jnp.asarray(msk), img.shape)))
                raw_shapes[i] = img.shape
                groups.setdefault(img.shape, []).append((i, img, msk))
            for shape, items in groups.items():
                gi = np.array([i for i, _, _ in items])
                raw_i = np.stack([im for _, im, _ in items])
                if pairs:
                    raw_m = np.stack([mk for _, _, mk in items])
                    ci, cm = _resize_pair_fn(shape, tuple(img_size))(
                        jnp.asarray(raw_i), jnp.asarray(raw_m))
                else:
                    ci = _resize_img_fn(shape, tuple(img_size))(
                        jnp.asarray(raw_i))
                    cm = None
                pending.append((gi, ci, cm))
        th.join()
    except BaseException:
        # Consumer failed mid-stream (resize/device error): the producer
        # may be blocked on q.put with the 2-slot queue full. Drain until
        # it parks its sentinel/exception so the thread (and its in-flight
        # decode buffers) can exit before we re-raise (ADVICE r3).
        while th.is_alive():
            try:
                q.get(timeout=0.1)
            except _queue.Empty:
                pass
        raise

    # one batched sync for every group
    fetched = jax.device_get([(ci, cm) for _, ci, cm in pending])
    for (gi, _, _), (ci, cm) in zip(pending, fetched):
        imgs_out[gi] = np.asarray(ci)
        if pairs:
            masks_out[gi] = np.asarray(cm)
    return imgs_out, masks_out, raw_shapes


def load_canonical_images(image_paths: Sequence[str],
                          img_size: Tuple[int, int] = (256, 256),
                          chunk: Optional[int] = _PREFETCH_CHUNK
                          ) -> np.ndarray:
    """Images-only decode + device-resize (no masks): (N,S,S) uint8.

    The inference path (``Segmenter.predict``) has no masks; this avoids
    the pair loader's double decode + pointless nearest mask resize."""
    imgs, _, _ = _decode_resize_pipelined(list(image_paths), None,
                                          tuple(img_size), chunk)
    return imgs


def load_canonical(image_paths: Sequence[str], mask_paths: Sequence[str],
                   img_size: Tuple[int, int] = (256, 256),
                   return_raw_shapes: bool = False,
                   chunk: Optional[int] = _PREFETCH_CHUNK):
    """Decode + device-resize all pairs to canonical uint8 frames.

    Returns (images (N,S,S) uint8, masks (N,S,S) uint8 binary 0/1), host
    numpy (small). Handles mixed raw shapes by grouping; decode and device
    resize run double-buffered in ``chunk``-file chunks (``chunk=None``
    decodes everything in one batch — the pre-pipeline behavior). With
    ``return_raw_shapes`` also returns the per-image raw (H, W) as an
    (N, 2) int32 array — used by raw-frame-aware augmentation
    (segtpu.data.augment.RAW_FRAME_AWARE)."""
    imgs_out, masks_out, raw_shapes = _decode_resize_pipelined(
        list(image_paths), list(mask_paths), tuple(img_size), chunk)
    if return_raw_shapes:
        return imgs_out, masks_out, raw_shapes
    return imgs_out, masks_out


def normalize_microscopy_image(image: jnp.ndarray,
                               clip_percentiles=(2.0, 98.0),
                               clip_limit: float = 2.0,
                               tile_grid=(8, 8)) -> jnp.ndarray:
    """Single-image microscopy normalization (dataset.py:30-42):
    percentile clip → truncate to uint8 → CLAHE → min-max to [0,1].

    Input uint8 (H, W); output float32 (H, W). jit/vmap-safe."""
    img_f = image.astype(jnp.float32)
    p_low, p_high = jnp.percentile(img_f, jnp.asarray(clip_percentiles))
    clipped = jnp.clip(img_f, p_low, p_high)
    # np .astype(np.uint8) truncates toward zero (dataset.py:38).
    clipped_u8 = jnp.floor(clipped).astype(jnp.uint8)
    eq = clahe(clipped_u8, clip_limit=clip_limit, tile_grid_size=tile_grid)
    eq_f = eq.astype(jnp.float32)
    mn = jnp.min(eq_f)
    mx = jnp.max(eq_f)
    return (eq_f - mn) / (mx - mn + 1e-8)


@jax.jit
def normalize_canonical(images_u8: jnp.ndarray) -> jnp.ndarray:
    """Batched normalization: (N,S,S) uint8 → (N,S,S,1) float32 on device."""
    out = jax.vmap(normalize_microscopy_image)(images_u8)
    return out[..., None]


@jax.jit
def scale_canonical(images_u8: jnp.ndarray) -> jnp.ndarray:
    """normalize=False path (dataset.py:57): /255 only."""
    return (images_u8.astype(jnp.float32) / 255.0)[..., None]
