"""On-device data augmentation.

The reference materializes augmented copies to disk through Albumentations +
cv2 and re-reads them every epoch (dataset.py:140-210,
forward_selection_integration.py:62-181). Here every transform is a pure
JAX function on the *canonical frame* (the resized uint8 image the model
actually sees), PRNG-key driven, vmapped over the batch and jit-compiled —
no disk round-trip, no host work.

Parity notes vs Albumentations:
- Parameter ranges/probabilities match the reference's declarations
  (production pipeline dataset.py:148-154; 18 candidates
  forward_selection_integration.py:71-179).
- Geometric transforms act on the canonical (resized, square) frame rather
  than the raw image. For warps this commutes with the resize up to
  interpolation error. ``random_crop``/``downscale`` are *raw-frame
  aware*: given the per-image raw shape (``raw_hw``), their raw-pixel
  parameters (the 96² raw crop, the raw-resolution downscale factor) are
  folded into the canonical resample so the effective magnitude matches
  the reference exactly; without ``raw_hw`` they fall back to
  canonical-relative magnitudes (the fast default).
- Masks are transformed jointly with nearest interpolation; intensity/blur/
  dropout transforms are image-only (Albumentations semantics).

All images are float32 in [0, 255] inside the pipeline; entry/exit points
round to uint8 like the reference's imwrite/imread cycle.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Pair = Tuple[jnp.ndarray, jnp.ndarray]  # (image (S,S) f32, mask (S,S) f32)


# ---------------------------------------------------------------- samplers

def _reflect101_idx(i: jnp.ndarray, n: int) -> jnp.ndarray:
    """cv2 BORDER_REFLECT_101 index folding (…dcb|abcd|cba…)."""
    if n == 1:
        return jnp.zeros_like(i)
    period = 2 * (n - 1)
    m = jnp.abs(i) % period
    return jnp.where(m >= n, period - m, m)


def _reflect101_coord(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """Continuous BORDER_REFLECT_101 fold of float coords into [0, n-1].

    Reflection is an isometry, so folding the float coordinate first and
    sampling in-range is identical to folding each integer tap (the
    gather formulation) — same taps, same weights."""
    if n == 1:
        return jnp.zeros_like(c)
    period = float(2 * (n - 1))
    m = jnp.abs(c) % period
    return jnp.where(m > n - 1, period - m, m)


def _axis_weights(coords: jnp.ndarray, n: int, border: str, nearest: bool
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(P,) float coords → ((P, n) sampling weights, (P,) valid).

    Bilinear weights are the linear hat max(0, 1-|c-x|): exactly the two
    floor/ceil taps with (1-f, f) weights. Nearest is the one-hot of
    floor(c+0.5). Border 'reflect' folds coords (valid ≡ 1); 'constant'
    zero-masks out-of-range coords."""
    if border == "reflect":
        c = _reflect101_coord(coords, n)
    else:
        # constant-0: keep RAW coords — hat taps that fall outside the
        # grid simply have no column, reproducing the gather form's
        # per-tap zero contribution (cv2's partial border blending).
        c = coords
    grid = jax.lax.broadcasted_iota(jnp.float32, (coords.shape[0], n), 1)
    if nearest:
        idx = jnp.floor(c + 0.5)[:, None]
        w = (grid == idx).astype(jnp.float32)
    else:
        w = jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - grid))
    return w, jnp.ones(coords.shape, jnp.float32)


def _sample_block(img: jnp.ndarray, ysf: jnp.ndarray, xsf: jnp.ndarray,
                  border: str, nearest: bool) -> jnp.ndarray:
    """One flat block of coords → samples (the two-matmul core)."""
    h, w = img.shape
    wy, vy = _axis_weights(ysf, h, border, nearest)   # (P, H)
    wx, vx = _axis_weights(xsf, w, border, nearest)   # (P, W)
    t = wx @ img.T                                    # (P, H): Σ_x img[y,x]·wx
    return jnp.sum(t * wy, axis=1) * vy * vx          # (P,)


# Above this many output pixels the weight matrices are built per block
# instead of whole-frame: whole-frame is (P, H)+(P, W)+(P, H) f32 — ~1.5 GB
# at 512² per image BEFORE the batch vmap (ADVICE r3). 64²·64 keeps the
# benchmarked 128²/256² single-shot paths unchanged.
_MATMUL_PIX_LIMIT = 256 * 256
_MATMUL_BLOCK = 16 * 1024


def _sample_matmul(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                   border: str, nearest: bool) -> jnp.ndarray:
    """Resample ``img`` (H, W) at float coords via two MXU contractions.

    TPU-first replacement for the per-pixel 2-D gather (XLA lowers
    batched point gathers to ~2 GB/s scalar loops — measured 232 ms for
    one warp at 128²/bs256, tools/augment_bench.py): since bilinear
    weights separate as hat(y)·hat(x) (and nearest as onehot·onehot),
    sampling is  out = (Wx · imgᵀ) ⊙-reduce Wy  — two dense matmuls the
    MXU eats. Exact same taps/weights as the gather form.

    Beyond ``_MATMUL_PIX_LIMIT`` output pixels the contraction is tiled
    over ``_MATMUL_BLOCK``-pixel chunks (lax.map — sequential, weights
    live only for one chunk), bounding HBM at flagship canonical sizes
    where the dense (H·W, H) matrices would not fit under the batch vmap.
    Matmul shapes stay MXU-sized (16k × H).
    """
    shape = ys.shape
    ysf, xsf = ys.reshape(-1), xs.reshape(-1)
    p = ysf.shape[0]
    if p <= _MATMUL_PIX_LIMIT:
        return _sample_block(img, ysf, xsf, border, nearest).reshape(shape)
    pad = (-p) % _MATMUL_BLOCK
    ysp = jnp.pad(ysf, (0, pad)).reshape(-1, _MATMUL_BLOCK)
    xsp = jnp.pad(xsf, (0, pad)).reshape(-1, _MATMUL_BLOCK)
    out = jax.lax.map(
        lambda yx: _sample_block(img, yx[0], yx[1], border, nearest),
        (ysp, xsp))
    return out.reshape(-1)[:p].reshape(shape)


def sample_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                    border: str = "reflect") -> jnp.ndarray:
    """Bilinear sample img at float coords (ys, xs)."""
    return _sample_matmul(img, ys, xs, border, nearest=False)


def sample_nearest(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                   border: str = "reflect") -> jnp.ndarray:
    return _sample_matmul(img, ys, xs, border, nearest=True)


def _warp_pair(pair: Pair, ys: jnp.ndarray, xs: jnp.ndarray,
               border: str) -> Pair:
    img, mask = pair
    return (sample_bilinear(img, ys, xs, border),
            sample_nearest(mask, ys, xs, border))


def _mesh(s: int):
    yy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    return yy, xx


# ------------------------------------------------------------- geometric

def t_horizontal_flip(pair: Pair, key) -> Pair:
    img, mask = pair
    return img[:, ::-1], mask[:, ::-1]


def t_vertical_flip(pair: Pair, key) -> Pair:
    img, mask = pair
    return img[::-1, :], mask[::-1, :]


def t_transpose(pair: Pair, key) -> Pair:
    img, mask = pair
    return img.T, mask.T


def t_random_rotate_90(pair: Pair, key) -> Pair:
    img, mask = pair
    k = jax.random.randint(key, (), 0, 4)
    rots_i = jnp.stack([jnp.rot90(img, n) for n in range(4)])
    rots_m = jnp.stack([jnp.rot90(mask, n) for n in range(4)])
    return rots_i[k], rots_m[k]


def t_affine(pair: Pair, key, scale=(0.95, 1.05), translate=(-0.05, 0.05),
             rotate=(-15.0, 15.0), shear=(-5.0, 5.0),
             border: str = "constant") -> Pair:
    """A.Affine parity (independently sampled sx/sy, x-shear, centered)."""
    s = pair[0].shape[0]
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    sx = jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    sy = jax.random.uniform(k2, (), minval=scale[0], maxval=scale[1])
    tx = jax.random.uniform(k3, (), minval=translate[0], maxval=translate[1]) * s
    ty = jax.random.uniform(k4, (), minval=translate[0], maxval=translate[1]) * s
    th = jnp.deg2rad(jax.random.uniform(k5, (), minval=rotate[0], maxval=rotate[1]))
    sh = jnp.deg2rad(jax.random.uniform(k6, (), minval=shear[0], maxval=shear[1]))

    cos, sin = jnp.cos(th), jnp.sin(th)
    shr = jnp.tan(sh)
    # Forward M2 = R @ Shear_x @ Scale (x right, y down), about image center;
    # Shear_x @ Scale = [[sx, shr*sy], [0, sy]].
    m00 = cos * sx
    m01 = cos * (shr * sy) - sin * sy
    m10 = sin * sx
    m11 = sin * (shr * sy) + cos * sy
    c = (s - 1) / 2.0
    t0 = c + tx - (m00 * c + m01 * c)
    t1 = c + ty - (m10 * c + m11 * c)
    det = m00 * m11 - m01 * m10
    i00, i01 = m11 / det, -m01 / det
    i10, i11 = -m10 / det, m00 / det
    yy, xx = _mesh(s)
    px = xx - t0
    py = yy - t1
    xs = i00 * px + i01 * py
    ys = i10 * px + i11 * py
    return _warp_pair(pair, ys, xs, border)


def t_grid_distortion(pair: Pair, key, num_steps: int = 5,
                      distort_limit: float = 0.3) -> Pair:
    """A.GridDistortion: per-axis piecewise-linear coordinate remap."""
    s = pair[0].shape[0]
    kx, ky = jax.random.split(key)
    cell = s // num_steps

    def axis_map(k):
        steps = 1.0 + jax.random.uniform(k, (num_steps + 1,),
                                         minval=-distort_limit,
                                         maxval=distort_limit)
        # boundary positions after distortion (cumulative cell widths)
        widths = jnp.full((num_steps + 1,), float(cell)) * steps
        # last (partial) segment covers s - num_steps*cell source pixels
        idx = jnp.arange(s)
        seg = jnp.minimum(idx // cell, num_steps)
        within = (idx - seg * cell).astype(jnp.float32)
        starts = jnp.concatenate([jnp.zeros(1), jnp.cumsum(widths)])[:num_steps + 1]
        pos = starts[seg] + within * steps[seg]
        return pos  # distorted position of each source index

    # Build forward map src_idx -> dst position, then invert by sampling:
    # approximate inverse by monotone linear interp of the forward map.
    fwd_x = axis_map(kx)
    fwd_y = axis_map(ky)
    dst = jnp.arange(s, dtype=jnp.float32)
    inv_x = jnp.interp(dst, fwd_x, jnp.arange(s, dtype=jnp.float32))
    inv_y = jnp.interp(dst, fwd_y, jnp.arange(s, dtype=jnp.float32))
    ys = inv_y[:, None] * jnp.ones((1, s))
    xs = jnp.ones((s, 1)) * inv_x[None, :]
    return _warp_pair(pair, ys, xs, "reflect")


def t_optical_distortion(pair: Pair, key, distort_limit: float = 0.5,
                         shift_limit: float = 0.5) -> Pair:
    """A.OpticalDistortion: barrel/pincushion remap (camera-model style)."""
    s = pair[0].shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    kk = jax.random.uniform(k1, (), minval=-distort_limit, maxval=distort_limit)
    dx = jax.random.uniform(k2, (), minval=-shift_limit, maxval=shift_limit)
    dy = jax.random.uniform(k3, (), minval=-shift_limit, maxval=shift_limit)
    fx = fy = float(s)
    cx = s / 2.0 + dx
    cy = s / 2.0 + dy
    yy, xx = _mesh(s)
    xn = (xx - cx) / fx
    yn = (yy - cy) / fy
    r2 = xn * xn + yn * yn
    factor = 1.0 + kk * r2 + kk * r2 * r2
    xs = xn * factor * fx + cx
    ys = yn * factor * fy + cy
    return _warp_pair(pair, ys, xs, "reflect")


def t_random_crop(pair: Pair, key, crop: int = 96, raw_hw=None) -> Pair:
    """A.RandomCrop(96, 96) followed by the dataset's resize back to the
    canonical size (the reference crops the raw file and the dataset
    resizes, forward_selection_integration.py:168-172 + dataset.py:50).

    ``raw_hw=None`` (canonical mode): crops ``crop``² of the canonical
    frame — a mild zoom. ``raw_hw=(H_raw, W_raw)`` (raw-frame mode, the
    reference's semantics): the 96² *raw*-pixel window is folded into the
    canonical resize — the effective canonical window is
    ``crop·S/raw`` per axis, so a 96² crop of a 1024² raw image is a strong
    ~10× zoom exactly as in the reference pipeline. The zoomed content is
    resampled from the canonical frame (the raw pixels are gone by this
    point), so it is a band-limited approximation of the true raw crop."""
    s = pair[0].shape[0]
    ky, kx = jax.random.split(key)
    out = jnp.arange(s, dtype=jnp.float32)
    if raw_hw is None:
        cy = cx = float(min(crop, s))
        oy = jax.random.randint(ky, (), 0, s - int(cy) + 1).astype(jnp.float32)
        ox = jax.random.randint(kx, (), 0, s - int(cx) + 1).astype(jnp.float32)
    else:
        raw_hw = jnp.asarray(raw_hw, jnp.float32)
        cy = jnp.clip(crop * s / raw_hw[0], 1.0, float(s))
        cx = jnp.clip(crop * s / raw_hw[1], 1.0, float(s))
        # reference: integer raw offset uniform in [0, raw-crop]; in
        # canonical units that is (continuous) uniform in [0, s-c].
        oy = jax.random.uniform(ky, ()) * (s - cy)
        ox = jax.random.uniform(kx, ()) * (s - cx)
    # sample the window back up at canonical resolution (bilinear for
    # image, nearest for mask — the dataset's INTER_AREA/NEAREST analog).
    ys = oy + ((out + 0.5) * (cy / s) - 0.5)[:, None] * jnp.ones((1, s))
    xs = ox + jnp.ones((s, 1)) * ((out + 0.5) * (cx / s) - 0.5)[None, :]
    return _warp_pair(pair, ys, xs, "reflect")


def t_crop_and_pad(pair: Pair, key, percent=(-0.1, 0.1)) -> Pair:
    """A.CropAndPad(percent, reflect, keep_size=True): each side is cropped
    (negative) or padded (positive) by an independent percentage, then the
    result is resized back."""
    s = pair[0].shape[0]
    ks = jax.random.split(key, 4)
    p = [jax.random.uniform(k, (), minval=percent[0], maxval=percent[1]) * s
         for k in ks]  # top, right, bottom, left (pad>0, crop<0)
    top, right, bottom, left = p
    y0 = -top
    y1 = s + bottom
    x0 = -left
    x1 = s + right
    out = jnp.arange(s, dtype=jnp.float32)
    ys = (y0 + (out + 0.5) * (y1 - y0) / s - 0.5)[:, None] * jnp.ones((1, s))
    xs = jnp.ones((s, 1)) * (x0 + (out + 0.5) * (x1 - x0) / s - 0.5)[None, :]
    return _warp_pair(pair, ys, xs, "reflect")


# ------------------------------------------------------------- intensity

def t_gauss_noise(pair: Pair, key, var_limit=(10.0, 50.0)) -> Pair:
    img, mask = pair
    kv, kn = jax.random.split(key)
    var = jax.random.uniform(kv, (), minval=var_limit[0], maxval=var_limit[1])
    noise = jax.random.normal(kn, img.shape) * jnp.sqrt(var)
    return jnp.clip(img + noise, 0, 255), mask


def t_invert(pair: Pair, key) -> Pair:
    img, mask = pair
    return 255.0 - img, mask


def t_solarize(pair: Pair, key, threshold: float = 128.0) -> Pair:
    img, mask = pair
    return jnp.where(img >= threshold, 255.0 - img, img), mask


def t_random_gamma(pair: Pair, key, gamma_limit=(80.0, 120.0)) -> Pair:
    img, mask = pair
    g = jax.random.uniform(key, (), minval=gamma_limit[0],
                           maxval=gamma_limit[1]) / 100.0
    out = jnp.power(jnp.clip(img / 255.0, 1e-7, 1.0), g) * 255.0
    return out, mask


def t_color_jitter(pair: Pair, key, brightness: float = 0.2,
                   contrast: float = 0.2) -> Pair:
    """A.ColorJitter(brightness=.2, contrast=.2, saturation=0, hue=0) on
    grayscale: random-order brightness/contrast (torchvision semantics)."""
    img, mask = pair
    kb, kc, ko = jax.random.split(key, 3)
    b = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)

    def bright(x):
        return jnp.clip(x * b, 0, 255)

    def contr(x):
        mean = jnp.mean(x)
        return jnp.clip(x * c + mean * (1 - c), 0, 255)

    first_b = jax.random.bernoulli(ko)
    out = jnp.where(first_b, contr(bright(img)), bright(contr(img)))
    return out, mask


# ----------------------------------------------------------- blur / scale

_MAX_K = 7


def _conv2_same_reflect(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """7×7 'same' convolution with reflect-101 border (cv2.filter2D)."""
    pad = _MAX_K // 2
    padded = jnp.pad(img, pad, mode="reflect")
    return jax.lax.conv_general_dilated(
        padded[None, :, :, None], kernel[:, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def _advanced_blur_kernel(key, blur_limit=(3, 7), sigmaX=(0.2, 1.0),
                          sigmaY=(0.2, 1.0), rotate_limit: float = 90.0,
                          beta_limit=(0.5, 8.0), noise_limit=(0.9, 1.1)):
    """A.AdvancedBlur generalized-Gaussian kernel, embedded in a 7×7 grid
    (entries outside the sampled odd ksize are zeroed)."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    n_sizes = (blur_limit[1] - blur_limit[0]) // 2 + 1
    ksize = blur_limit[0] + 2 * jax.random.randint(k1, (), 0, n_sizes)
    sx = jax.random.uniform(k2, (), minval=sigmaX[0], maxval=sigmaX[1])
    sy = jax.random.uniform(k3, (), minval=sigmaY[0], maxval=sigmaY[1])
    th = jnp.deg2rad(jax.random.uniform(k4, (), minval=-rotate_limit,
                                        maxval=rotate_limit))
    use_low = jax.random.bernoulli(k5)
    beta = jnp.where(use_low,
                     jax.random.uniform(k6, (), minval=beta_limit[0], maxval=1.0),
                     jax.random.uniform(k6, (), minval=1.0, maxval=beta_limit[1]))
    noise = jax.random.uniform(k7, (_MAX_K, _MAX_K), minval=noise_limit[0],
                               maxval=noise_limit[1])

    c = (_MAX_K - 1) / 2.0
    ax = jnp.arange(_MAX_K, dtype=jnp.float32) - c
    gx, gy = jnp.meshgrid(ax, ax)
    rx = gx * jnp.cos(th) + gy * jnp.sin(th)
    ry = -gx * jnp.sin(th) + gy * jnp.cos(th)
    d2 = (rx / sx) ** 2 + (ry / sy) ** 2
    kern = jnp.exp(-0.5 * jnp.power(d2 + 1e-9, beta))
    half = (ksize - 1) // 2
    inside = (jnp.abs(gx) <= half) & (jnp.abs(gy) <= half)
    kern = kern * inside * noise
    return kern / (jnp.sum(kern) + 1e-9)


def t_advanced_blur(pair: Pair, key, **kw) -> Pair:
    img, mask = pair
    kern = _advanced_blur_kernel(key, **kw)
    return jnp.clip(_conv2_same_reflect(img, kern), 0, 255), mask


def t_downscale(pair: Pair, key, scale_min: float = 0.5,
                scale_max: float = 0.75, raw_hw=None) -> Pair:
    """A.Downscale: quality loss from down+up scaling, emulated as a single
    resample at quantized low-res sample positions (static shapes).

    ``raw_hw=None`` (canonical mode): the low-res grid has ``S·sc`` samples
    across the field. ``raw_hw`` given (raw-frame mode, reference
    semantics): the reference downscales the *raw* image, so the grid has
    ``raw·sc`` samples across the field — when ``raw·sc ≥ S`` (big raw
    files) the dataset's later resize to S averages the artifact away and
    the transform is a near-no-op, exactly as in the reference pipeline."""
    img, mask = pair
    s = img.shape[0]
    sc = jax.random.uniform(key, (), minval=scale_min, maxval=scale_max)
    if raw_hw is None:
        low_y = low_x = jnp.floor(s * sc)
    else:
        raw_hw = jnp.asarray(raw_hw, jnp.float32)
        low_y = jnp.floor(raw_hw[0] * sc)
        low_x = jnp.floor(raw_hw[1] * sc)
    out = jnp.arange(s, dtype=jnp.float32)

    def snap(low):
        # position in low-res space, snapped to low-res sample centers:
        lowpos = jnp.clip(jnp.floor((out + 0.5) * (low / s)), 0, low - 1)
        return (lowpos + 0.5) * (s / low) - 0.5

    ys = snap(low_y)[:, None] * jnp.ones((1, s))
    xs = jnp.ones((s, 1)) * snap(low_x)[None, :]
    return sample_bilinear(img, ys, xs, "reflect"), mask


# ------------------------------------------------------------- dropout

def t_coarse_dropout(pair: Pair, key, max_holes: int = 8, max_h: int = 8,
                     max_w: int = 8, min_holes: int = 4, min_h: int = 4,
                     min_w: int = 4, fill_value: float = 0.0) -> Pair:
    img, mask = pair
    s = img.shape[0]
    kn, kk = jax.random.split(key)
    n_holes = jax.random.randint(kn, (), min_holes, max_holes + 1)
    keys = jax.random.split(kk, max_holes)
    yy, xx = _mesh(s)
    keep = jnp.ones((s, s), bool)
    for i in range(max_holes):
        k1, k2, k3, k4 = jax.random.split(keys[i], 4)
        hh = jax.random.randint(k1, (), min_h, max_h + 1)
        ww = jax.random.randint(k2, (), min_w, max_w + 1)
        y0 = jax.random.randint(k3, (), 0, s - min_h + 1)
        x0 = jax.random.randint(k4, (), 0, s - min_w + 1)
        hole = ((yy >= y0) & (yy < y0 + hh) & (xx >= x0) & (xx < x0 + ww))
        keep = keep & (~hole | (i >= n_holes))
    return jnp.where(keep, img, fill_value), mask


def t_grid_dropout(pair: Pair, key, ratio: float = 0.1, unit_min: int = 4,
                   unit_max: int = 8, random_offset: bool = True) -> Pair:
    img, mask = pair
    s = img.shape[0]
    ku, ko1, ko2 = jax.random.split(key, 3)
    unit = jax.random.randint(ku, (), unit_min, unit_max + 1)
    # hole side = unit * ratio (linear, Albumentations semantics), >= 1 px
    hole = jnp.clip((unit * ratio).astype(jnp.int32), 1, unit - 1)
    if random_offset:
        oy = jax.random.randint(ko1, (), 0, unit_max)
        ox = jax.random.randint(ko2, (), 0, unit_max)
    else:
        oy = ox = 0
    yy, xx = _mesh(s)
    iy = (yy.astype(jnp.int32) + oy) % unit
    ix = (xx.astype(jnp.int32) + ox) % unit
    drop = (iy < hole) & (ix < hole)
    return jnp.where(drop, 0.0, img), mask


# ------------------------------------------------------------- pipeline

# Candidate registry — names, callables and parameter ranges mirror
# forward_selection_integration.py:71-179 exactly.
AUGMENTATION_CANDIDATES: Dict[str, Callable] = {
    "horizontal_flip": t_horizontal_flip,
    "affine": partial(t_affine, border="reflect"),
    "random_rotate_90": t_random_rotate_90,
    "transpose": t_transpose,
    "grid_distortion": t_grid_distortion,
    "vertical_flip": t_vertical_flip,
    "optical_distortion": t_optical_distortion,
    "gauss_noise": t_gauss_noise,
    "invert": t_invert,
    "solarize": t_solarize,
    "random_gamma": t_random_gamma,
    "color_jitter": t_color_jitter,
    "advanced_blur": t_advanced_blur,
    "downscale": t_downscale,
    "coarse_dropout": t_coarse_dropout,
    "grid_dropout": t_grid_dropout,
    "random_crop": t_random_crop,
    "crop_and_pad": t_crop_and_pad,
}


def production_probability(name: str) -> float:
    """Per-transform production probabilities
    (forward_selection_integration.py:255-264)."""
    if name in ("horizontal_flip", "vertical_flip"):
        return 0.5
    if name == "clahe":
        return 0.7
    if name in ("random_rotate_90", "transpose"):
        return 0.3
    return 0.3


def build_pipeline(names: Sequence[str], for_selection: bool = True
                   ) -> Callable[[Pair, jax.Array], Pair]:
    """Compose candidate transforms with probability gating.

    Selection mode: p=0.7 for every transform; production mode: realistic
    per-kind probabilities (forward_selection_integration.py:238-268)."""
    steps = []
    for name in names:
        p = 0.7 if for_selection else production_probability(name)
        steps.append((AUGMENTATION_CANDIDATES[name], p,
                      name in RAW_FRAME_AWARE))
    return _compose(steps)


#: Transforms whose reference semantics act on the *raw* (pre-resize)
#: image with pixel-unit parameters, so their effective canonical-frame
#: magnitude depends on the raw shape (VERDICT round 1: random_crop crops
#: 96² of the raw file, forward_selection_integration.py:168-172;
#: downscale's factor applies to raw resolution).
RAW_FRAME_AWARE = frozenset({"random_crop", "downscale"})


class Pipeline:
    """Composed probability-gated transform chain.

    Callable as ``pipeline((img, mask), key)`` like a single transform;
    pass ``raw_hw=(H_raw, W_raw)`` to run raw-frame-aware transforms with
    the reference's raw-pixel semantics. Carries lazily-built jitted+vmapped
    batch functions so repeated ``augment_batch`` calls (every fold × every
    training run) reuse one compiled program instead of re-tracing a fresh
    closure each time."""

    def __init__(self, steps: List[Tuple]):
        # steps: (fn, p) or (fn, p, raw_aware)
        self.steps = [s if len(s) == 3 else (*s, False) for s in steps]
        self._batch_jit = None
        self._batch_jit_raw = None
        self._batch_jit_label = None

    def __call__(self, pair: Pair, key: jax.Array, raw_hw=None) -> Pair:
        img, mask = pair
        for i, (fn, p, raw_aware) in enumerate(self.steps):
            kp, kt = jax.random.split(jax.random.fold_in(key, i))
            do = jax.random.uniform(kp) < p
            if raw_aware and raw_hw is not None:
                ni, nm = fn((img, mask), kt, raw_hw=raw_hw)
            else:
                ni, nm = fn((img, mask), kt)
            img = jnp.where(do, ni, img)
            mask = jnp.where(do, nm, mask)
        return img, mask

    def batch_fn(self, raw: bool = False, label_mask: bool = False):
        """``label_mask=True``: the mask holds INTEGER CLASS LABELS, not a
        binary field — skip the reference's 0/255 scaling + >127 threshold
        (dataset.py:180, binary-only) and round back to the nearest label.
        Exact label preservation holds because every mask-touching
        transform samples with NEAREST interpolation (t_affine/rot90/flip
        relayouts), so augmented mask values stay in the input label set."""
        def one(img_u8, mask_u8, k, raw_hw=None):
            img = img_u8.astype(jnp.float32)
            scale = 1.0 if label_mask else 255.0  # dataset.py:180
            mask = mask_u8.astype(jnp.float32) * scale
            ai, am = self((img, mask), k, raw_hw=raw_hw)
            out_i = jnp.floor(jnp.clip(ai, 0, 255) + 0.5).astype(jnp.uint8)
            if label_mask:
                return out_i, jnp.floor(am + 0.5).astype(jnp.uint8)
            return out_i, (am > 127.0).astype(jnp.uint8)

        if label_mask:
            if raw:
                raise ValueError("label_mask is the production (canonical-"
                                 "frame) path; raw-frame semantics are "
                                 "forward-selection/binary only")
            if self._batch_jit_label is None:
                self._batch_jit_label = jax.jit(jax.vmap(
                    lambda i, m, k: one(i, m, k)))
            return self._batch_jit_label
        if raw:
            if self._batch_jit_raw is None:
                self._batch_jit_raw = jax.jit(jax.vmap(one))
            return self._batch_jit_raw
        if self._batch_jit is None:
            self._batch_jit = jax.jit(jax.vmap(
                lambda i, m, k: one(i, m, k)))
        return self._batch_jit


def _compose(steps: List[Tuple[Callable, float]]) -> Pipeline:
    return Pipeline(steps)


@functools.lru_cache(maxsize=1)
def _production_pipeline():
    """The fixed 4-transform production augmenter (dataset.py:148-154):
    RandomRotate90 p=.5, Affine(constant border) p=.3, VerticalFlip p=.5,
    AdvancedBlur(3-7) p=.3. Singleton so every CellAugmenter shares one
    compiled batch program."""
    return _compose([
        (t_random_rotate_90, 0.5),
        (partial(t_affine, border="constant"), 0.3),
        (t_vertical_flip, 0.5),
        (t_advanced_blur, 0.3),
    ])


def augment_batch(images_u8: jnp.ndarray, masks_u8: jnp.ndarray,
                  key: jax.Array, pipeline: Callable, copies: int,
                  raw_hw=None, label_mask: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate ``copies`` augmented versions of every canonical image.

    images_u8 (N,S,S) uint8, masks_u8 (N,S,S) uint8 {0,1} →
    (copies*N, S, S) uint8 images and binary masks, fully on device.
    ``raw_hw`` (N, 2) original pre-resize shapes enables the reference's
    raw-pixel semantics for raw-frame-aware transforms (RAW_FRAME_AWARE).
    ``label_mask``: masks carry integer class labels (multiclass) — see
    Pipeline.batch_fn."""
    n = images_u8.shape[0]
    if isinstance(pipeline, Pipeline):
        fn = pipeline.batch_fn(raw=raw_hw is not None,
                               label_mask=label_mask)
    else:  # bare callable: wrap (no cross-call jit reuse)
        if raw_hw is not None:
            raise ValueError(
                "augment_batch: raw_hw requires a Pipeline — a bare "
                "callable is wrapped with canonical-frame semantics and "
                "would silently ignore the raw shapes. Build a "
                "Pipeline([...]) from raw-frame-aware transforms instead.")
        fn = Pipeline([]).batch_fn() if pipeline is None else \
            _compose([(lambda pair, k, _p=pipeline: _p(pair, k), 1.0)]).batch_fn()

    keys = jax.random.split(key, copies * n).reshape(copies, n)
    outs_i, outs_m = [], []
    for c in range(copies):
        if raw_hw is not None:
            ai, am = fn(images_u8, masks_u8, keys[c],
                        jnp.asarray(raw_hw, jnp.float32))
        else:
            ai, am = fn(images_u8, masks_u8, keys[c])
        outs_i.append(ai)
        outs_m.append(am)
    return jnp.concatenate(outs_i), jnp.concatenate(outs_m)


class CellAugmenter:
    """Production augmenter (reference: CellAugmenter, dataset.py:140-210).

    Same contract — N augmented copies per training image, originals kept —
    but produces device arrays instead of temp files, so ``cleanup()`` is a
    no-op kept for API parity."""

    def __init__(self, augmentations_per_image: int = 3, seed: int = 0,
                 n_classes: int = 1):
        self.augmentations_per_image = int(augmentations_per_image)
        self._pipeline = _production_pipeline()
        self._key = jax.random.key(seed)
        self._label_mask = int(n_classes) > 1

    def augment_training_data(self, images_u8: np.ndarray, masks_u8: np.ndarray
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(N,S,S) canonical uint8 images + binary masks →
        originals + N·copies augmented, concatenated (dataset.py:156-202)."""
        images_u8 = jnp.asarray(images_u8)
        masks_u8 = jnp.asarray(masks_u8)
        if self.augmentations_per_image == 0:
            return images_u8, masks_u8
        self._key, sub = jax.random.split(self._key)
        ai, am = augment_batch(images_u8, masks_u8, sub, self._pipeline,
                               self.augmentations_per_image,
                               label_mask=self._label_mask)
        all_i = jnp.concatenate([images_u8, ai])
        all_m = jnp.concatenate([masks_u8, am])
        n0 = images_u8.shape[0]
        print(f"Training data: {n0} original + {all_i.shape[0]-n0} augmented"
              f" = {all_i.shape[0]} total")
        return all_i, all_m

    def cleanup(self):  # API parity (dataset.py:204-207); nothing on disk.
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.cleanup()
        return False
