"""All 16 segmentation losses as pure jit-safe JAX functions.

Reference parity: losses.py:13-342 (formulas reproduced exactly, same
defaults). Every loss takes ``(logits, targets)`` — raw model outputs and
binary float targets, any layout (most flatten); the spatially-aware losses
(``boundary``, ``distance_map_bce``, ``hausdorff``) expect NHWC
``(B, H, W, C)``. All run fully on device: the EDT-based losses use the
exact on-device EDT (segtpu/ops/edt.py) instead of the reference's per-batch
scipy CPU round trip (losses.py:216-232, 262-273).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from segtpu.ops.edt import distance_transform_edt


def _bce_with_logits(logits, targets):
    """Numerically stable elementwise BCE-with-logits (== torch
    F.binary_cross_entropy_with_logits, losses.py:37)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def dice_loss(logits, targets, smooth: float = 1.0):
    """DiceLoss — losses.py:13-28. Flattens across the whole batch."""
    pred = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    intersection = jnp.sum(pred * t)
    union = jnp.sum(pred) + jnp.sum(t)
    dice = (2.0 * intersection + smooth) / (union + smooth)
    return 1.0 - dice


def bce_loss(logits, targets):
    """BCELoss — losses.py:31-37."""
    return jnp.mean(_bce_with_logits(logits, targets))


def weighted_bce_loss(logits, targets, beta: float = 1.0):
    """WeightedBCELoss — losses.py:40-50."""
    bce = _bce_with_logits(logits, targets)
    weights = targets * beta + (1.0 - targets)
    return jnp.mean(bce * weights)


def balanced_bce_loss(logits, targets):
    """BalancedBCELoss — losses.py:53-65 (beta = 1 − fg-ratio per batch)."""
    beta = 1.0 - jnp.sum(targets) / targets.size
    bce = _bce_with_logits(logits, targets)
    weights = targets * beta + (1.0 - targets) * (1.0 - beta)
    return jnp.mean(bce * weights)


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0,
               reduction: str = "mean"):
    """FocalLoss — losses.py:68-86."""
    bce = _bce_with_logits(logits, targets)
    pt = jnp.exp(-bce)
    fl = alpha * (1.0 - pt) ** gamma * bce
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def tversky_loss(logits, targets, alpha: float = 0.5, beta: float = 0.5,
                 smooth: float = 1.0):
    """TverskyLoss — losses.py:89-109."""
    pred = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    tp = jnp.sum(pred * t)
    fp = jnp.sum((1.0 - t) * pred)
    fn = jnp.sum(t * (1.0 - pred))
    tversky = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return 1.0 - tversky


def focal_tversky_loss(logits, targets, alpha: float = 0.5, beta: float = 0.5,
                       gamma: float = 1.0, smooth: float = 1.0):
    """FocalTverskyLoss — losses.py:112-122."""
    tl = tversky_loss(logits, targets, alpha=alpha, beta=beta, smooth=smooth)
    return tl ** gamma


def sensitivity_specificity_loss(logits, targets, w: float = 0.5,
                                 smooth: float = 1e-7):
    """SensitivitySpecificityLoss — losses.py:125-147."""
    pred = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    tp = jnp.sum(pred * t)
    tn = jnp.sum((1.0 - pred) * (1.0 - t))
    fp = jnp.sum((1.0 - t) * pred)
    fn = jnp.sum(t * (1.0 - pred))
    sensitivity = tp / (tp + fn + smooth)
    specificity = tn / (tn + fp + smooth)
    return 1.0 - (w * sensitivity + (1.0 - w) * specificity)


def log_cosh_dice_loss(logits, targets, smooth: float = 1.0):
    """LogCoshDiceLoss — losses.py:150-158."""
    dl = dice_loss(logits, targets, smooth=smooth)
    return jnp.log(jnp.cosh(dl))


def combo_loss(logits, targets, alpha: float = 0.5, smooth: float = 1.0):
    """ComboLoss (α·BCE + (1−α)·Dice) — losses.py:161-171. Global default."""
    return alpha * bce_loss(logits, targets) + (1.0 - alpha) * dice_loss(
        logits, targets, smooth=smooth)


def exponential_logarithmic_loss(logits, targets, w_dice: float = 0.5,
                                 w_cross: float = 0.5, gamma_dice: float = 0.3,
                                 gamma_cross: float = 0.3):
    """ExponentialLogarithmicLoss — losses.py:174-194."""
    dice = dice_loss(logits, targets)
    exp_dice = jnp.mean(
        (-jnp.log(jnp.clip(1.0 - dice, min=1e-7))) ** gamma_dice)
    pred = jax.nn.sigmoid(logits)
    # F.binary_cross_entropy on probabilities (losses.py:191); torch clamps
    # log terms at -100 — irrelevant here since the -log is re-clamped below.
    ce = -(targets * jnp.log(jnp.clip(pred, min=1e-38))
           + (1.0 - targets) * jnp.log(jnp.clip(1.0 - pred, min=1e-38)))
    exp_cross = jnp.mean(
        (-jnp.log(jnp.clip(1.0 - ce, min=1e-7))) ** gamma_cross)
    return w_dice * exp_dice + w_cross * exp_cross


def _batched_edt(x):
    """EDT over (B, H, W, C) via vmap on (B, C)."""
    bhwc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    f = jax.vmap(jax.vmap(distance_transform_edt))
    return jnp.moveaxis(f(bhwc), 1, -1)


def distance_map_bce_loss(logits, targets, alpha: float = 1.0):
    """DistanceMapPenalizedCrossEntropy — losses.py:197-232.

    Distance map of the ground truth (per sample/channel, normalized by its
    own max), computed on device with the exact EDT. Non-differentiable map →
    stop_gradient, matching the reference (targets carry no grad)."""
    dist = _batched_edt(targets)
    # Per-(sample, channel) max normalization (losses.py:226-227).
    mx = jnp.max(dist, axis=(1, 2), keepdims=True)
    dist = jax.lax.stop_gradient(dist / (mx + 1e-7))
    weight = 1.0 + alpha * dist
    bce = _bce_with_logits(logits, targets)
    return jnp.mean(weight * bce)


def hausdorff_loss(logits, targets, alpha: float = 2.0, reduction: str = "mean"):
    """HausdorffDistanceLoss (approximation) — losses.py:235-273.

    Reference computes EDT of the *soft* sigmoid prediction (any nonzero
    pixel is foreground) and of the target, each normalized by the global
    field max (losses.py:273), then weights the squared error by
    pred_dist^α + target_dist^α."""
    pred = jax.nn.sigmoid(logits)

    def dtm(img):
        # losses.py:262-273 — skip all-zero (b, c) slices.
        field = _batched_edt(img)
        nonempty = (jnp.max(jnp.abs(img), axis=(1, 2), keepdims=True) > 0)
        field = jnp.where(nonempty, field, 0.0)
        return field / (jnp.max(field) + 1e-7)

    pred_dist = jax.lax.stop_gradient(dtm(pred))
    target_dist = jax.lax.stop_gradient(dtm(targets))
    pred_error = (pred - targets) ** 2
    distance = pred_dist ** alpha + target_dist ** alpha
    hd = pred_error * distance
    if reduction == "mean":
        return jnp.mean(hd)
    if reduction == "sum":
        return jnp.sum(hd)
    return hd


def _gaussian_kernel(size: int, sigma: float):
    """2-D Gaussian kernel (losses.py:309-318)."""
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g2 = coords ** 2
    g = jnp.exp(-(g2[None, :] + g2[:, None]) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _max_pool_same(x, k: int):
    """torch F.max_pool2d(kernel=k, stride=1, padding=k//2) on NHWC."""
    pad = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (pad, pad), (pad, pad), (0, 0)])


def boundary_loss(logits, targets, theta0: int = 3, theta: int = 5):
    """BoundaryLoss — losses.py:276-307. NHWC inputs.

    Morphological boundary (maxpool dilate − erode), Gaussian-smoothed,
    weight map 1 + 10·boundary on BCE."""
    t = targets.astype(jnp.float32)
    dilated = _max_pool_same(t, theta0)
    eroded = -_max_pool_same(-t, theta0)
    boundary = dilated - eroded

    kernel = _gaussian_kernel(theta, theta / 3.0)
    c = t.shape[-1]
    # Depthwise conv, padding theta//2 (losses.py:294-298).
    kern = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # HWIO, groups=C
    pad = theta // 2
    boundary = jax.lax.conv_general_dilated(
        boundary, kern, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    weight = jax.lax.stop_gradient(1.0 + 10.0 * boundary)
    bce = _bce_with_logits(logits, targets)
    return jnp.mean(weight * bce)


def triple_combo_loss(logits, targets, alpha_dice: float = 0.33,
                      alpha_bce: float = 0.33, alpha_focal: float = 0.34,
                      focal_alpha: float = 0.25, gamma: float = 2.0,
                      smooth: float = 1.0):
    """TripleComboLoss — losses.py:322-342."""
    return (alpha_dice * dice_loss(logits, targets, smooth=smooth)
            + alpha_bce * bce_loss(logits, targets)
            + alpha_focal * focal_loss(logits, targets, alpha=focal_alpha,
                                       gamma=gamma))
