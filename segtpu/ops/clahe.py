"""CLAHE (Contrast-Limited Adaptive Histogram Equalization) as a pure JAX op.

The reference preprocesses every microscopy image with OpenCV's CLAHE
(``cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8))``, dataset.py:37-38).
There is no JAX primitive for this, so we reimplement OpenCV's exact
algorithm (per-tile 256-bin histograms → clip → excess redistribution →
CDF LUTs → bilinear interpolation between the four neighbouring tile LUTs)
with vectorized TPU-friendly ops: the histogram is a one-hot reduction, the
LUT build is a cumsum, and interpolation is four gathers — all fusable by
XLA, no host round-trip.

Parity target: bit-exact vs cv2 on uint8 inputs (verified in
tests/test_ops.py when cv2 is available).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HIST_SIZE = 256


def _tile_luts(tiles: jnp.ndarray, clip_limit_int: int) -> jnp.ndarray:
    """Build per-tile LUTs. tiles: (tY, tX, th*tw) uint8 → (tY, tX, 256) uint8."""
    tY, tX, n = tiles.shape
    bins = jnp.arange(_HIST_SIZE, dtype=jnp.int32)
    # Histogram: (tY, tX, 256) via one-hot sum.
    onehot = (tiles[..., None].astype(jnp.int32) == bins).astype(jnp.int32)
    hist = onehot.sum(axis=2)

    if clip_limit_int > 0:
        clipped = jnp.maximum(hist - clip_limit_int, 0).sum(axis=-1)  # (tY,tX)
        hist = jnp.minimum(hist, clip_limit_int)
        redist = clipped // _HIST_SIZE
        residual = clipped - redist * _HIST_SIZE
        hist = hist + redist[..., None]
        # OpenCV residual loop: for(i=0; i<256 && residual>0; i+=step, residual--)
        # with step = max(256//residual, 1): bins j*step for j < residual get +1.
        step = jnp.maximum(_HIST_SIZE // jnp.maximum(residual, 1), 1)[..., None]
        res = residual[..., None]
        bump = ((bins % step) == 0) & ((bins // step) < res)
        hist = hist + bump.astype(jnp.int32)

    cdf = jnp.cumsum(hist, axis=-1).astype(jnp.float32)
    lut_scale = jnp.float32(_HIST_SIZE - 1) / jnp.float32(n)
    lut = jnp.clip(jnp.rint(cdf * lut_scale), 0, 255).astype(jnp.uint8)
    return lut


def clahe(img: jnp.ndarray, clip_limit: float = 2.0,
          tile_grid_size: tuple = (8, 8)) -> jnp.ndarray:
    """OpenCV-parity CLAHE on a single uint8 image (H, W) → uint8 (H, W).

    Reference parity: dataset.py:37-38. vmap over leading axes for batches.
    """
    if img.dtype != jnp.uint8:
        img = img.astype(jnp.uint8)
    h, w = img.shape
    tiles_y, tiles_x = tile_grid_size

    pad_y = (tiles_y - h % tiles_y) % tiles_y
    pad_x = (tiles_x - w % tiles_x) % tiles_x
    if pad_y or pad_x:
        # cv2 uses BORDER_REFLECT_101 on bottom/right only.
        src_lut = jnp.pad(img, ((0, pad_y), (0, pad_x)), mode="reflect")
    else:
        src_lut = img
    ph, pw = h + pad_y, w + pad_x
    th, tw = ph // tiles_y, pw // tiles_x
    tile_area = th * tw

    clip_int = 0
    if clip_limit > 0.0:
        clip_int = max(int(clip_limit * tile_area / _HIST_SIZE), 1)

    tiles = src_lut.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tiles_y, tiles_x, tile_area)
    lut = _tile_luts(tiles, clip_int)  # (tY, tX, 256)
    lut_flat = lut.reshape(tiles_y * tiles_x, _HIST_SIZE)

    # Interpolation over the ORIGINAL (unpadded) image, cv2 convention:
    # txf = x/tw - 0.5; tx1 = floor(txf); frac before clamping.
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ya = (tyf - ty1)[:, None]          # (h,1)
    xa = (txf - tx1)[None, :]          # (1,w)
    ty2 = jnp.minimum(ty1 + 1, tiles_y - 1)
    tx2 = jnp.minimum(tx1 + 1, tiles_x - 1)
    ty1 = jnp.maximum(ty1, 0)
    tx1 = jnp.maximum(tx1, 0)

    v = img.astype(jnp.int32)

    def gather(tyi, txi):
        idx = (tyi[:, None] * tiles_x + txi[None, :]) * _HIST_SIZE + v
        return jnp.take(lut_flat.reshape(-1), idx).astype(jnp.float32)

    res = (gather(ty1, tx1) * (1 - xa) * (1 - ya)
           + gather(ty1, tx2) * xa * (1 - ya)
           + gather(ty2, tx1) * (1 - xa) * ya
           + gather(ty2, tx2) * xa * ya)
    return jnp.clip(jnp.rint(res), 0, 255).astype(jnp.uint8)
