"""cv2-parity image resizing as XLA-friendly linear operators.

The reference resizes images with ``cv2.resize(..., INTER_AREA)`` and masks
with ``INTER_NEAREST`` (dataset.py:50-51). On TPU we express these as two 1-D
matrix products with *statically precomputed* weight matrices, so a batch
resize is two MXU matmuls fused by XLA — no gather scatter, no host work.

- INTER_AREA (downscale): exact fractional pixel-coverage averaging,
  identical math to OpenCV's area interpolation.
- INTER_NEAREST: OpenCV convention ``src = floor(dst * scale)``.
- INTER_LINEAR / align_corners=False bilinear: half-pixel-center sampling
  (used for ``F.interpolate(..., mode='bilinear')`` parity,
  advanced_models.py:354).

Weight matrices depend only on (in_size, out_size) which are static under
jit, so they are built in numpy at trace time and baked into the graph as
constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=256)
def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic matrix of fractional coverage.

    Output cell i covers the source interval [i*s, (i+1)*s), s = in/out.
    Each source pixel contributes its overlap with that interval / s.
    Exact INTER_AREA for any scale <= 1; for upscale this degrades to
    (fractional) nearest which matches cv2's INTER_AREA upscale behavior
    closely enough that the reference never exercises it (it only downsizes).
    """
    s = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        lo, hi = i * s, (i + 1) * s
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, in_size)):
            overlap = min(hi, j + 1) - max(lo, j)
            if overlap > 0:
                w[i, j] = overlap / s
    return w.astype(np.float32)


@lru_cache(maxsize=256)
def _bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) half-pixel-center bilinear weights
    (== torch ``align_corners=False`` == cv2 INTER_LINEAR sample points,
    with edge clamping)."""
    s = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        x = (i + 0.5) * s - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        a = np.clip(x0, 0, in_size - 1)
        b = np.clip(x0 + 1, 0, in_size - 1)
        w[i, a] += 1.0 - frac
        w[i, b] += frac
    return w.astype(np.float32)


@lru_cache(maxsize=256)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """cv2 INTER_NEAREST source indices: floor(dst * in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def _apply_separable(img: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply (out_h,in_h) and (out_w,in_w) weights to the trailing two
    non-channel dims of ``img`` shaped (..., H, W) or (..., H, W, C)."""
    wh = jnp.asarray(wh)
    ww = jnp.asarray(ww)
    if img.ndim >= 3 and img.shape[-1] <= 8 and img.shape[-3] == wh.shape[1]:
        # (..., H, W, C): contract H then W.
        out = jnp.einsum("oh,...hwc->...owc", wh, img.astype(jnp.float32))
        out = jnp.einsum("pw,...owc->...opc", ww, out)
        return out
    # (..., H, W)
    out = jnp.einsum("oh,...hw->...ow", wh, img.astype(jnp.float32))
    out = jnp.einsum("pw,...ow->...op", ww, out)
    return out


def resize_area(img: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """cv2.resize(img, (w,h), INTER_AREA) equivalent (float32 output).

    Reference parity: dataset.py:50 (note cv2 takes (width,height); here we
    take (height,width)). Exact for downscale; cv2 itself switches to
    INTER_LINEAR when enlarging in both dims, which we mirror. Mixed
    up/down scaling (never exercised by the reference) uses per-axis
    area/bilinear weights."""
    out_h, out_w = out_hw
    h, w = (img.shape[-3], img.shape[-2]) if (img.ndim >= 3 and img.shape[-1] <= 8) \
        else (img.shape[-2], img.shape[-1])
    if out_h >= h and out_w >= w:
        return resize_bilinear(img, out_hw)
    wh = _area_weights(h, out_h) if out_h <= h else _bilinear_weights(h, out_h)
    ww = _area_weights(w, out_w) if out_w <= w else _bilinear_weights(w, out_w)
    return _apply_separable(img, wh, ww)


def resize_bilinear(img: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Half-pixel bilinear (align_corners=False) resize."""
    out_h, out_w = out_hw
    h, w = (img.shape[-3], img.shape[-2]) if (img.ndim >= 3 and img.shape[-1] <= 8) \
        else (img.shape[-2], img.shape[-1])
    return _apply_separable(img, _bilinear_weights(h, out_h), _bilinear_weights(w, out_w))


def resize_nearest(img: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """cv2.resize(..., INTER_NEAREST) equivalent; preserves dtype.

    Reference parity: dataset.py:51 (mask resize)."""
    out_h, out_w = out_hw
    channels_last = img.ndim >= 3 and img.shape[-1] <= 8
    if channels_last:
        h, w = img.shape[-3], img.shape[-2]
        ih = jnp.asarray(_nearest_index(h, out_h))
        iw = jnp.asarray(_nearest_index(w, out_w))
        return img[..., ih, :, :][..., :, iw, :]
    h, w = img.shape[-2], img.shape[-1]
    ih = jnp.asarray(_nearest_index(h, out_h))
    iw = jnp.asarray(_nearest_index(w, out_w))
    return img[..., ih, :][..., :, iw]
