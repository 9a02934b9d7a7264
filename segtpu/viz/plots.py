"""Visualization trio (reference: visualize.py:8-135).

Plots run on host matplotlib from device arrays fetched once; predictions
come from a jitted forward pass.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.data.discovery import load_original_data
from segtpu.data.io import decode_gray
from segtpu.data.loader import CellSegmentationDataset


def visualize_predictions(engine, state, loader, num_samples: int = 3,
                          save_path: Optional[str] = None):
    """Input / ground-truth / prediction grid (visualize.py:8-80).

    ``engine``: TrainEngine (or any object with .model); ``state``:
    TrainState. Handles models returning (logits, features) tuples — the
    analog of the reference's legacy W-Net branch (visualize.py:31-36)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images, masks = next(iter(loader))
    model = engine.model if hasattr(engine, "model") else engine

    fwd = jax.jit(lambda p, b, x: model.apply(
        {"params": p, "batch_stats": b}, x, train=False))
    outputs = fwd(state.params, state.batch_stats, jnp.asarray(images))
    if isinstance(outputs, tuple):
        preds, recon = outputs
        recon = np.asarray(recon)
    else:
        preds, recon = outputs, None
    preds = np.asarray(jax.nn.sigmoid(preds))
    images, masks = np.asarray(images), np.asarray(masks)

    num_samples = min(num_samples, len(images))
    rows = 4 if recon is not None else 3
    fig, axs = plt.subplots(rows, num_samples,
                            figsize=(4 * num_samples, 4 * rows),
                            squeeze=False)
    for i in range(num_samples):
        axs[0, i].imshow(images[i, :, :, 0], cmap="gray")
        axs[0, i].set_title("Input Image")
        axs[0, i].axis("off")
        axs[1, i].imshow(masks[i, :, :, 0], cmap="gray")
        axs[1, i].set_title("Ground Truth")
        axs[1, i].axis("off")
        axs[2, i].imshow((preds[i, :, :, 0] > 0.5).astype(float), cmap="gray")
        axs[2, i].set_title("Prediction")
        axs[2, i].axis("off")
        if recon is not None:
            axs[3, i].imshow(recon[i, :, :, 0], cmap="gray")
            axs[3, i].set_title("Reconstruction")
            axs[3, i].axis("off")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=200, bbox_inches="tight")
        print(f"Visualization saved to {save_path}")
    return fig


def plot_broadband_vs_fluorescence(data_dir: str = "manual_labels",
                                   save_path: str = "figures/image_comparison.pdf"):
    """Side-by-side modality figure (visualize.py:83-103)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data_w = load_original_data(data_dir, image_type="W")
    data_b = load_original_data(data_dir, image_type="B")
    img_w = decode_gray(data_w["image_paths"][0])
    img_b = decode_gray(data_b["image_paths"][0])

    fig, axs = plt.subplots(1, 2, figsize=(10, 5))
    axs[0].imshow(img_w, cmap="gray")
    axs[0].set_title("Broadband Image (W)")
    axs[0].axis("off")
    axs[1].imshow(img_b, cmap="gray")
    axs[1].set_title("Fluorescence Image (B)")
    axs[1].axis("off")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.tight_layout()
    plt.savefig(save_path, bbox_inches="tight")
    print(f"Saved comparison to {save_path}")
    plt.close(fig)
    return fig


def plot_class_imbalance(image_type: str = "W",
                         data_dir: str = "manual_labels",
                         img_size=(256, 256),
                         save_path: str = "figures/class_imbalance_bar.pdf"):
    """Foreground/background pixel share bar chart (visualize.py:105-135)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = load_original_data(data_dir, image_type=image_type)
    ds = CellSegmentationDataset(data["image_paths"], data["mask_paths"],
                                 img_size=img_size)
    _, masks = ds.materialize()
    masks = np.asarray(masks)
    ratio = float(masks.sum() / masks.size)
    bg = 1 - ratio

    fig, ax = plt.subplots(figsize=(6, 5))
    ax.bar(["Background", "Foreground"], [bg * 100, ratio * 100],
           color=["gray", "red"])
    ax.set_ylabel("Pixel Percentage (%)")
    ax.set_title("Class Imbalance in Cancer Cell Masks")
    ax.set_ylim(0, 100)
    for i, v in enumerate([bg * 100, ratio * 100]):
        ax.text(i, v + 1, f"{v:.2f}%", ha="center")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.tight_layout()
    plt.savefig(save_path, dpi=200)
    print(f"Saved imbalance plot to {save_path}")
    plt.close(fig)
    return ratio
