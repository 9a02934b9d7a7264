"""Segmentation metrics.

Reference parity:
- ``calculate_metrics`` — utils.py:120-151 (threshold 0.5 → confusion counts
  → precision/recall/F1/IoU/accuracy, epsilon 1e-7). Here it is jit-safe and
  stays on device: no per-batch ``.item()`` syncs (the reference's hot-loop
  device→host stalls, train.py:52-60).
- ``iou_score`` — utils.py:86-118 (optional connected-component cleanup).
- ``post_process`` — utils.py:58-84 (small-object removal). Runs on host
  (labeling is inherently sequential); used post-hoc, never inside jit.
- ``compute_foreground_ratio`` — utils.py:9-23.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

_EPS = 1e-7


def calculate_metrics(pred: jnp.ndarray, target: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-batch metrics from probabilities (post-sigmoid) and binary targets.

    Returns a dict of 0-d device arrays; jit/vmap/pjit-safe. Under GSPMD the
    sums become global reductions automatically.
    """
    pred_binary = (pred > 0.5).astype(jnp.float32)
    p = pred_binary.reshape(-1)
    t = target.reshape(-1).astype(jnp.float32)

    tp = jnp.sum(p * t)
    fp = jnp.sum(p * (1.0 - t))
    fn = jnp.sum((1.0 - p) * t)
    tn = jnp.sum((1.0 - p) * (1.0 - t))

    precision = tp / (tp + fp + _EPS)
    recall = tp / (tp + fn + _EPS)
    f1 = 2 * precision * recall / (precision + recall + _EPS)
    iou = tp / (tp + fp + fn + _EPS)
    accuracy = (tp + tn) / (tp + tn + fp + fn + _EPS)

    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "iou": iou,
        "accuracy": accuracy,
    }


def post_process(prediction: np.ndarray, min_size: int = 15) -> np.ndarray:
    """Remove connected components smaller than ``min_size`` pixels.

    Host-side (numpy/scipy); reference: utils.py:58-84."""
    binary = (np.asarray(prediction) > 0.5).astype(np.uint8)
    try:
        from scipy import ndimage
        labeled, num = ndimage.label(binary)
        if num == 0:
            return binary
        sizes = ndimage.sum(binary, labeled, range(1, num + 1))
    except ImportError:  # pragma: no cover - scipy is normally present
        labeled, num, sizes = _label_fallback(binary)
        if num == 0:
            return binary
    small = np.asarray(sizes) < min_size
    remove = small[labeled - 1]
    binary[remove] = 0
    return binary


def _label_fallback(binary: np.ndarray):
    """4-connectivity two-pass union-find labeling (scipy-free fallback)."""
    flat = binary.reshape(-1)
    h_w = binary.shape
    parent = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    labels = np.zeros(binary.shape, dtype=np.int32)
    nxt = 1
    it = np.nditer(binary, flags=["multi_index"])
    for v in it:
        if not v:
            continue
        i, j = it.multi_index
        up = labels[i - 1, j] if i > 0 else 0
        left = labels[i, j - 1] if j > 0 else 0
        if up and left:
            ru, rl = find(up), find(left)
            labels[i, j] = ru
            if ru != rl:
                parent[rl] = ru
        elif up or left:
            labels[i, j] = find(up or left)
        else:
            parent[nxt] = nxt
            labels[i, j] = nxt
            nxt += 1
    # Flatten unions & relabel densely
    remap = {}
    out = np.zeros_like(labels)
    for i in range(h_w[0]):
        for j in range(h_w[1]):
            l = labels[i, j]
            if l:
                r = find(l)
                if r not in remap:
                    remap[r] = len(remap) + 1
                out[i, j] = remap[r]
    num = len(remap)
    sizes = np.bincount(out.reshape(-1))[1:] if num else np.array([])
    return out, num, sizes


def iou_score(pred, target, apply_post_processing: bool = False,
              min_size: int = 25) -> float:
    """IoU from logits, with optional post-processing (utils.py:86-118).

    Note: the sigmoid here runs in host float64 numpy, while the training
    metrics sigmoid runs on device in f32/bf16 — logits within ~1e-6 of
    exactly 0 can therefore threshold differently between the two paths.
    Post-hoc use only (as in the reference); harmless at that tolerance."""
    pred_np = np.asarray(jnp.asarray(pred))
    pred_sigmoid = 1.0 / (1.0 + np.exp(-pred_np))
    target_np = np.asarray(jnp.asarray(target))

    if apply_post_processing:
        pred_binary = post_process(pred_sigmoid, min_size=min_size)
    else:
        pred_binary = (pred_sigmoid > 0.5).astype(np.uint8)
    target_binary = (target_np > 0.5).astype(np.uint8)

    intersection = np.sum(pred_binary * target_binary)
    union = np.sum((pred_binary + target_binary) > 0)
    return float(intersection / (union + _EPS))


def compute_foreground_ratio(masks=None, image_type: str = "W",
                             data_dir: str = "manual_labels",
                             img_size=(256, 256)) -> float:
    """Fraction of foreground pixels (utils.py:9-23).

    Either pass an iterable/stack of masks, or (reference signature) let it
    load+preprocess the dataset itself from ``data_dir``/``image_type``."""
    if masks is None:
        from segtpu.data.discovery import load_original_data
        from segtpu.data.loader import CellSegmentationDataset
        data = load_original_data(data_dir, image_type)
        ds = CellSegmentationDataset(data["image_paths"], data["mask_paths"],
                                     img_size=img_size)
        _, masks_arr = ds.materialize()
        masks = [np.asarray(masks_arr)]
    total = 0
    fg = 0.0
    for m in masks:
        arr = np.asarray(m)
        fg += float(arr.sum())
        total += arr.size
    ratio = fg / max(total, 1)
    print(f"Foreground (cell) pixels: {ratio*100:.2f}%")
    return ratio
