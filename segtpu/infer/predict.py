"""Whole-image inference helpers (fit/predict/evaluate API surface).

The reference exposes inference only through ``evaluate``/
``visualize_predictions`` (train.py:71-112, visualize.py:8-80); here
prediction is a first-class jitted path with a cached program per shape.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _apply(model, params, batch_stats, x):
    return model.apply({"params": params, "batch_stats": batch_stats}, x,
                       train=False)


def output_activation(model):
    """Logits→probability map for a model: per-pixel sigmoid for binary
    heads, channel softmax for multiclass (n_classes > 1) — matching the
    activations the train engine scores with (train/engine.py)."""
    if getattr(model, "n_classes", 1) > 1:
        return lambda lg: jax.nn.softmax(lg, axis=-1)
    return jax.nn.sigmoid


@partial(jax.jit, static_argnums=(0,))
def _predict_jit(model, params, batch_stats, x):
    # `model` is a static arg: the activation branch resolves at trace time
    return output_activation(model)(_apply(model, params, batch_stats, x))


def predict_proba(model, state, images) -> jnp.ndarray:
    """Probability maps for a batch (B,H,W,C): sigmoid per channel for
    binary models, softmax over channels for multiclass."""
    return _predict_jit(model, state.params, state.batch_stats,
                        jnp.asarray(images))


def predict(model, state, images, threshold: float = 0.5) -> np.ndarray:
    """Binary masks at the reference's 0.5 threshold (utils.py:108)."""
    return np.asarray(predict_proba(model, state, images) > threshold,
                      dtype=np.uint8)
