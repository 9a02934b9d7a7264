"""Decision-threshold sweep: pick the binarization threshold by metric.

The reference hard-codes ``pred > 0.5`` everywhere (utils.py:86-151,
train.py:56-60); on imbalanced microscopy masks the IoU-optimal threshold
is routinely elsewhere, and a post-training sweep is the standard cheap
win. TPU-native formulation: ALL thresholds are evaluated in ONE jitted
program — a ``vmap`` over the threshold scalar reuses the probability
tensor resident in HBM, so a 19-point sweep costs roughly one extra
elementwise pass, not 19 prediction runs.

Exposed as ``sweep_thresholds`` (probabilities + masks in) and
``Segmenter.sweep_threshold`` (images + masks in, uses the trained model).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-7  # matches calculate_metrics (metrics.py), utils.py:120-151


@jax.jit
def _sweep_counts(probs: jnp.ndarray, targets: jnp.ndarray,
                  thresholds: jnp.ndarray) -> jnp.ndarray:
    """(T, 4) [tp, fp, fn, tn] for every threshold, one device program."""
    p = probs.reshape(-1)
    t = targets.reshape(-1).astype(jnp.float32)

    def counts(thr):
        pb = (p > thr).astype(jnp.float32)
        tp = jnp.sum(pb * t)
        fp = jnp.sum(pb * (1.0 - t))
        fn = jnp.sum((1.0 - pb) * t)
        tn = jnp.sum((1.0 - pb) * (1.0 - t))
        return jnp.stack([tp, fp, fn, tn])

    return jax.vmap(counts)(thresholds)


def sweep_thresholds(probs, masks,
                     thresholds: Optional[Sequence[float]] = None,
                     metric: str = "iou") -> Dict:
    """Evaluate binary-segmentation metrics at each threshold.

    ``probs``: probabilities (any shape); ``masks``: same-shape binary
    targets. Default grid: 0.05..0.95 in steps of 0.05. Metric formulas
    and epsilon match ``calculate_metrics`` exactly, so
    ``sweep_thresholds(p, m)['iou'][i]`` at threshold 0.5 equals
    ``calculate_metrics(p, m)['iou']``.

    Returns {'thresholds', 'precision', 'recall', 'f1', 'iou', 'accuracy'
    (numpy arrays of len T), 'best_threshold', 'best_value', 'metric'},
    where best_* maximize ``metric`` (default IoU; ties → lowest
    threshold).
    """
    if thresholds is None:
        thresholds = np.arange(1, 20, dtype=np.float32) * 0.05
    thr = np.asarray(thresholds, dtype=np.float32)
    if thr.ndim != 1 or thr.size == 0:
        raise ValueError("thresholds must be a non-empty 1-D sequence")
    c = np.asarray(jax.device_get(_sweep_counts(
        jnp.asarray(probs), jnp.asarray(masks), jnp.asarray(thr))),
        dtype=np.float64)
    tp, fp, fn, tn = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    precision = tp / (tp + fp + _EPS)
    recall = tp / (tp + fn + _EPS)
    out = {
        "thresholds": thr.astype(np.float64),
        "precision": precision,
        "recall": recall,
        "f1": 2 * precision * recall / (precision + recall + _EPS),
        "iou": tp / (tp + fp + fn + _EPS),
        "accuracy": (tp + tn) / (tp + tn + fp + fn + _EPS),
    }
    if metric not in ("precision", "recall", "f1", "iou", "accuracy"):
        raise ValueError(f"unknown metric '{metric}'")
    best = int(np.argmax(out[metric]))
    out["metric"] = metric
    out["best_threshold"] = float(thr[best])
    out["best_value"] = float(out[metric][best])
    return out
