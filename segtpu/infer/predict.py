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


@partial(jax.jit, static_argnums=(0,))
def _predict_jit(model, params, batch_stats, x):
    return jax.nn.sigmoid(_apply(model, params, batch_stats, x))


def predict_proba(model, state, images) -> jnp.ndarray:
    """Sigmoid probabilities for a batch (B,H,W,1)."""
    return _predict_jit(model, state.params, state.batch_stats,
                        jnp.asarray(images))


def predict(model, state, images, threshold: float = 0.5) -> np.ndarray:
    """Binary masks at the reference's 0.5 threshold (utils.py:108)."""
    return np.asarray(predict_proba(model, state, images) > threshold,
                      dtype=np.uint8)
