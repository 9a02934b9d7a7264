"""Test-time augmentation: D4 symmetry-averaged inference.

New capability beyond the reference (its inference surface is plain
``evaluate``/``visualize_predictions``, train.py:71-112, visualize.py:8-80):
average sigmoid probabilities over the dihedral group of the image plane —
the 8 exact symmetries (4 rotations × optional transpose) for square
inputs, or the 4 shape-preserving ones (rotations by 0/180 + both flips)
for rectangular inputs.

TPU notes: every group element is a pure relayout (``rot90``/``swapaxes``/
``flip``), so each variant fuses into the model's first conv; the variants
run UNROLLED inside one jitted program, accumulating a running mean, so
peak activation memory stays ~1× a plain forward (not 8×) and XLA
schedules the variants back-to-back on the device queue.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# A D4 element acts on NHWC as rot90^k(transpose^t(x)); (k, t) pairs:
D4_ELEMENTS: Tuple[Tuple[int, int], ...] = tuple(
    (k, t) for t in (0, 1) for k in range(4))


def _apply_d4(x: jnp.ndarray, k: int, t: int) -> jnp.ndarray:
    if t:
        x = jnp.swapaxes(x, 1, 2)
    if k:
        x = jnp.rot90(x, k, axes=(1, 2))
    return x


def _invert_d4(y: jnp.ndarray, k: int, t: int) -> jnp.ndarray:
    if k:
        y = jnp.rot90(y, -k, axes=(1, 2))
    if t:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _apply_flips(x: jnp.ndarray, fh: int, fv: int) -> jnp.ndarray:
    if fh:
        x = jnp.flip(x, axis=2)
    if fv:
        x = jnp.flip(x, axis=1)
    return x


def tta_elements(square: bool) -> Tuple[Tuple[int, int], ...]:
    """The group elements used for a given input aspect."""
    if square:
        return D4_ELEMENTS
    # (fh, fv) flip flags — each self-inverse, the four form a group
    return ((0, 0), (1, 0), (0, 1), (1, 1))


@partial(jax.jit, static_argnums=(0, 4))
def _tta_predict_jit(model, params, batch_stats, x, square: bool):
    from segtpu.infer.predict import output_activation
    act = output_activation(model)  # sigmoid, or softmax when multiclass

    def fwd(v):
        return act(model.apply(
            {"params": params, "batch_stats": batch_stats}, v, train=False))

    elems = tta_elements(square)
    acc = None
    for e in elems:
        if square:
            k, t = e
            p = _invert_d4(fwd(_apply_d4(x, k, t)), k, t)
        else:
            fh, fv = e
            # flips are self-inverse
            p = _apply_flips(fwd(_apply_flips(x, fh, fv)), fh, fv)
        acc = p if acc is None else acc + p
    return acc / len(elems)


def tta_predict_proba(model, state, images) -> jnp.ndarray:
    """Symmetry-averaged probabilities for a batch (B,H,W,C) — sigmoid for
    binary models, channel softmax for multiclass (each group element's
    map is a point on the probability simplex, so their mean is too)."""
    x = jnp.asarray(images)
    if x.ndim != 4:
        raise ValueError(f"expected (B,H,W,C) batch, got shape {x.shape}")
    square = x.shape[1] == x.shape[2]
    return _tta_predict_jit(model, state.params, state.batch_stats, x,
                            square)


def tta_predict(model, state, images, threshold: float = 0.5) -> np.ndarray:
    """Symmetry-averaged binary masks at the reference's 0.5 threshold."""
    return np.asarray(tta_predict_proba(model, state, images) > threshold,
                      dtype=np.uint8)


def d4_average_apply(apply_fn, out_transform=jax.nn.sigmoid):
    """Wrap a square-input ``apply_fn(x: (B,S,S,Cin)) -> (B,S,S,Cout)``
    into its D4 symmetry average in ``out_transform`` space (probability
    space by default, matching :func:`tta_predict_proba`).

    The wrapped function is a drop-in ``apply_fn`` for the tiled
    sliding-window predictor (segtpu/infer/tiled.py) — tiles are square,
    so the full 8-element group applies per tile, and the cosine-window
    blending then averages probabilities whose per-tile symmetrization is
    already exact. Same memory shape as a plain forward (unrolled
    accumulation, see module docstring)."""

    def wrapped(x):
        acc = None
        for k, t in D4_ELEMENTS:
            p = _invert_d4(out_transform(apply_fn(_apply_d4(x, k, t))), k, t)
            acc = p if acc is None else acc + p
        return acc / len(D4_ELEMENTS)

    return wrapped
