"""Multi-class segmentation losses (softmax).

The reference is strictly binary (sigmoid, losses.py); the north star's
config list includes 512² multi-class training (BASELINE.json config #2).
Targets are integer class labels, shape (B, H, W) or (B, H, W, 1), any
numeric dtype. Logits: (B, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _labels(targets) -> jnp.ndarray:
    t = targets
    if t.ndim == 4 and t.shape[-1] == 1:
        t = t[..., 0]
    return t.astype(jnp.int32)


def softmax_ce_loss(logits, targets):
    """Mean softmax cross-entropy over pixels."""
    t = _labels(targets)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def dice_loss_mc(logits, targets, smooth: float = 1.0):
    """Macro soft-Dice over classes (softmax probabilities vs one-hot)."""
    t = _labels(targets)
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(t, c, dtype=probs.dtype)
    inter = jnp.sum(probs * onehot, axis=(0, 1, 2))
    union = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(onehot, axis=(0, 1, 2))
    dice = (2.0 * inter + smooth) / (union + smooth)
    return 1.0 - jnp.mean(dice)


def combo_loss_mc(logits, targets, alpha: float = 0.5, smooth: float = 1.0):
    return alpha * softmax_ce_loss(logits, targets) + \
        (1.0 - alpha) * dice_loss_mc(logits, targets, smooth=smooth)


def focal_loss_mc(logits, targets, gamma: float = 2.0):
    """Multi-class focal loss (softmax)."""
    t = _labels(targets)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    pt = jnp.exp(picked)
    return -jnp.mean((1.0 - pt) ** gamma * picked)


def get_multiclass_loss(config):
    """Registry analog of get_loss_function for n_classes > 1. Keys reuse
    the reference names where the concept carries over."""
    from functools import partial
    name = (config or {}).get("loss_fn", "combo")
    table = {
        "ce": lambda: softmax_ce_loss,
        "bce": lambda: softmax_ce_loss,   # closest analog
        "dice": lambda: partial(dice_loss_mc,
                                smooth=config.get("smooth", 1.0)),
        "combo": lambda: partial(combo_loss_mc,
                                 alpha=config.get("loss_alpha", 0.5)),
        "focal": lambda: partial(focal_loss_mc,
                                 gamma=config.get("focal_gamma", 2.0)),
    }
    if name in table:
        fn = table[name]()
        fn.name = name
        return fn
    print(f"Warning: no multiclass '{name}', defaulting to combo")
    return partial(combo_loss_mc, alpha=config.get("loss_alpha", 0.5))


def calculate_metrics_multiclass(probs, targets):
    """Macro-averaged confusion metrics from softmax probabilities.

    Same keys as the binary calculate_metrics so histories/harnesses work
    unchanged; 'iou' is the macro mean-IoU over classes."""
    t = _labels(targets)
    c = probs.shape[-1]
    pred = jnp.argmax(probs, axis=-1)
    eps = 1e-7
    pred_oh = jax.nn.one_hot(pred, c, dtype=jnp.float32)
    t_oh = jax.nn.one_hot(t, c, dtype=jnp.float32)
    axes = tuple(range(pred_oh.ndim - 1))
    tp = jnp.sum(pred_oh * t_oh, axis=axes)
    fp = jnp.sum(pred_oh * (1 - t_oh), axis=axes)
    fn = jnp.sum((1 - pred_oh) * t_oh, axis=axes)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    iou = tp / (tp + fp + fn + eps)
    accuracy = jnp.mean((pred == t).astype(jnp.float32))
    return {
        "precision": jnp.mean(precision),
        "recall": jnp.mean(recall),
        "f1": jnp.mean(f1),
        "iou": jnp.mean(iou),
        "accuracy": accuracy,
    }
