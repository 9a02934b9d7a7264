"""Exact Euclidean distance transform as a pure JAX op.

The reference's distance-map and Hausdorff losses call
``scipy.ndimage.distance_transform_edt`` per sample on the CPU inside the
loss (losses.py:216-232, 262-273) — a device→host→device round trip per
batch. Here we compute the *exact* EDT on device so those losses stay inside
one jit-compiled, differentiable-free (stop-gradient) graph:

1. Per-column 1-D distance to the nearest zero via two cummax passes.
2. Exact lower-envelope minimization expressed as a dense
   ``min_k (g(i,k)^2 + (j-k)^2)`` broadcast reduction — O(H·W·W) FLOPs, which
   the VPU eats for breakfast at the reference's 128²/256² resolutions and
   avoids data-dependent control flow that XLA can't tile.

Matches scipy exactly (both are exact EDTs); tests compare elementwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)


def _column_dist(nonzero: jnp.ndarray) -> jnp.ndarray:
    """Per-column distance (in rows) to nearest zero. nonzero: (H,W) bool.

    Returns float32 (H,W); _BIG where the column has no zero."""
    h = nonzero.shape[0]
    idx = jnp.arange(h, dtype=jnp.float32)[:, None]
    zero_pos_down = jnp.where(~nonzero, idx, -_BIG)
    last_zero = jax.lax.cummax(zero_pos_down, axis=0)
    d_down = idx - last_zero                      # dist to zero at-or-above
    zero_pos_up = jnp.where(~nonzero, idx, _BIG)
    next_zero = jnp.flip(jax.lax.cummin(jnp.flip(zero_pos_up, 0), axis=0), 0)
    d_up = next_zero - idx                        # dist to zero at-or-below
    return jnp.minimum(jnp.minimum(d_down, d_up), _BIG)


def distance_transform_edt(img: jnp.ndarray) -> jnp.ndarray:
    """Exact EDT of a 2-D array: distance from each nonzero element to the
    nearest zero element (scipy.ndimage.distance_transform_edt semantics).

    img: (H, W) any dtype (nonzero == foreground). Returns float32 (H, W).
    vmap over leading axes for batches/channels.
    """
    nonzero = img != 0
    g = _column_dist(nonzero)                     # (H, W)
    h, w = img.shape
    ks = jnp.arange(w, dtype=jnp.float32)
    # D2[i, j] = min_k g[i,k]^2 + (j-k)^2   — (H, W, W) broadcast reduce.
    g2 = jnp.minimum(g * g, _BIG)                 # cap to avoid inf overflow
    dj = (ks[None, :] - ks[:, None]) ** 2         # (Wj, Wk)
    d2 = jnp.min(g2[:, None, :] + dj[None, :, :], axis=-1)
    d2 = jnp.where(nonzero, d2, 0.0)
    # scipy quirk: with no background element at all, scipy's feature
    # transform initialization leaves every pixel pointing at the virtual
    # index (-1, 0) — i.e. the "EDT" becomes distance to (-1, 0). The
    # reference's Hausdorff loss always exercises this path (sigmoid
    # predictions have no exact zeros, losses.py:262-273), so replicate it.
    ii = jnp.arange(h, dtype=jnp.float32)[:, None]
    corner = jnp.sqrt((ii + 1.0) ** 2 + ks[None, :] ** 2)
    any_zero = jnp.any(~nonzero)
    return jnp.where(any_zero, jnp.sqrt(d2), corner)
