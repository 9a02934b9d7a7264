"""Spatial (halo-exchange) model parallelism for large-image inference.

The segmentation analog of sequence parallelism: one image too large for
a single chip's HBM (or latency budget) is sharded ROW-WISE across the
mesh. Each chip holds an (H/N, W) band, exchanges ``halo`` boundary rows
with its two neighbors over ICI (`jax.lax.ppermute` inside `shard_map` —
nearest-neighbor traffic only, never a gather of the full image), runs
the model forward on its haloed band, and keeps the center crop. The
blended result is exactly the single-device halo-tiled prediction cut
along rows (same receptive-field contract as
`segtpu.infer.tiled` ``mode="halo"``: exact vs dense wherever the model's
receptive radius ≤ ``halo``; pinned in tests/test_spatial.py).

The reference has no multi-device code at all and RESIZES large inputs
away (`/root/reference/dataset.py:50-51`); this module is part of the
rebuild's parallelism surface (SURVEY.md §2.4), alongside GSPMD data
parallelism (parallel/data_parallel.py) and mesh-sharded tile batches
(infer/tiled.py ``shard_tiles_axis``).

Communication cost per forward: 2 × halo × W × C elements per chip pair,
independent of N — at 2048², halo 32, f32 that is 0.5 MB/neighbor vs a
16.8 MB image: ~3% of the bytes a tile-gather CP layout would move.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_sharded_predictor(apply_fn: Callable, mesh: Mesh,
                                   axis: str = "data", halo: int = 32):
    """Build a jitted row-sharded predictor over ``mesh[axis]``.

    ``apply_fn(x: (1, h, W, C_in)) -> (1, h, W, C_out)`` — a model
    forward closed over params, accepting the haloed band height
    ``H/N + 2·halo`` (for the stride-32 U-Nets this means
    ``H/N + 2·halo`` and ``W`` divisible by 32).

    Returns ``predict(image: (H, W, C_in)) -> (H, W, C_out)`` where the
    image rows must divide evenly by the axis size. Each device computes
    only its band; peak per-chip activation memory is that of a
    ``(H/N + 2·halo, W)`` forward.
    """
    n = mesh.shape[axis]
    if halo < 0:
        raise ValueError(f"halo must be ≥ 0, got {halo}")

    def band_fn(band: jnp.ndarray) -> jnp.ndarray:
        # band: (H/n, W, C) local shard. Exchange halo rows with
        # neighbors: my TOP halo rows travel to the chip above me (they
        # are its bottom context) and my BOTTOM halo rows to the chip
        # below. Edge chips get edge-replicated padding instead.
        h = band.shape[0]
        if halo:
            down = [(i, i + 1) for i in range(n - 1)]   # src -> src+1
            up = [(i + 1, i) for i in range(n - 1)]     # src -> src-1
            from_above = jax.lax.ppermute(band[h - halo:], axis, down)
            from_below = jax.lax.ppermute(band[:halo], axis, up)
            idx = jax.lax.axis_index(axis)
            # non-participating edges receive zeros from ppermute —
            # replace with edge replication (same policy as the tiled
            # halo predictor's image-border padding)
            top_pad = jnp.broadcast_to(band[:1], from_above.shape)
            bot_pad = jnp.broadcast_to(band[h - 1:], from_below.shape)
            from_above = jnp.where(idx == 0, top_pad, from_above)
            from_below = jnp.where(idx == n - 1, bot_pad, from_below)
            haloed = jnp.concatenate([from_above, band, from_below], axis=0)
        else:
            haloed = band
        out = apply_fn(haloed[None])[0]
        return out[halo:halo + h] if halo else out

    sharded = jax.shard_map(band_fn, mesh=mesh,
                            in_specs=P(axis, None, None),
                            out_specs=P(axis, None, None))

    @jax.jit
    def predict(image: jnp.ndarray) -> jnp.ndarray:
        h = image.shape[0]
        if h % n:
            raise ValueError(
                f"image rows {h} must divide evenly over {n} devices")
        if halo > h // n:
            # band[h_band - halo:] would silently clamp and the center
            # crop would select the wrong rows — refuse instead.
            raise ValueError(
                f"halo {halo} exceeds the per-device band height "
                f"{h // n} ({h} rows / {n} devices) — use fewer devices, "
                f"a smaller halo, or a taller image")
        image = jax.lax.with_sharding_constraint(
            image, NamedSharding(mesh, P(axis, None, None)))
        return sharded(image)

    return predict


def spatial_predict(model, state, image, mesh: Mesh, axis: str = "data",
                    halo: int = 32):
    """One-call spatially-sharded inference on a single large image.

    Returns probabilities (H, W, n_classes), matching
    ``segtpu.infer.tiled.tiled_predict(..., mode="halo")`` semantics but
    with the band forward distributed across ``mesh[axis]``.
    """
    import numpy as np

    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        img = img[..., None]

    def apply_fn(x):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, x,
                           train=False)

    from segtpu.infer.predict import output_activation
    act = output_activation(model)
    predictor = make_spatial_sharded_predictor(apply_fn, mesh, axis=axis,
                                               halo=halo)
    return np.asarray(act(predictor(img)))
