"""Tiled sliding-window inference with overlap blending.

The reference resizes every image down to a fixed small size
(dataset.py:50-51) and has no large-image path (SURVEY.md §5
"long-context" row). This is the spatial analog of sequence parallelism
the north star demands (BASELINE.json config #4): 2048×2048-class inputs
are processed as overlapping tiles, forward passes run as one jit-compiled
scan over tile batches (XLA pipelines the HBM tile gathers against the MXU
convs — the double-buffering falls out of the scan schedule), and logits
are blended back with a separable cosine-ramp window.

Tiles can additionally be sharded across chips by running the same program
under a mesh with the tile-batch axis sharded (the "context parallel" of
images).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _blend_window(tile: int, overlap: int) -> np.ndarray:
    """Separable 2-D blending window: cosine ramp of width ``overlap`` at
    each border, flat 1.0 in the interior. Guarantees that overlapping
    windows sum to ~1 with stride = tile - overlap."""
    w = np.ones(tile, np.float32)
    if overlap > 0:
        ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(overlap) + 0.5) / overlap)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return np.outer(w, w).astype(np.float32)


def _tile_origins(size: int, tile: int, stride: int) -> np.ndarray:
    """Static list of tile top-left offsets covering [0, size)."""
    if size <= tile:
        return np.array([0], np.int32)
    starts = list(range(0, size - tile, stride)) + [size - tile]
    return np.unique(np.array(starts, np.int32))


def _blend_weight_sum(ph: int, pw: int, tile: int, overlap: int,
                      ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Total blend weight each output pixel receives — fully determined by
    the (static) tile geometry, so computed once on the host instead of
    accumulated tile-by-tile on device (halves the scatter traffic;
    measured in tools/tiled_profile.py)."""
    win = _blend_window(tile, overlap)
    wsum = np.zeros((ph, pw, 1), np.float32)
    for oy in ys:
        for ox in xs:
            wsum[oy:oy + tile, ox:ox + tile, 0] += win
    return np.maximum(wsum, 1e-8)


#: ``batch_tiles=None`` resolves to min(n_tiles, _AUTO_BATCH_CAP): one
#: forward per image when the tile count is modest (routing halo mode to
#: its scan-free reshape assembly), capped so pathological image sizes
#: can't explode peak HBM (32 tiles ≈ a bs-40 512² forward — well inside
#: the measured bs128 envelope).
_AUTO_BATCH_CAP = 32


def make_tiled_predictor(apply_fn: Callable, tile: int = 512,
                         overlap: int = 64,
                         batch_tiles: Optional[int] = None,
                         shard_tiles_axis: Optional[str] = None,
                         mode: str = "blend"):
    """Build a jitted tiled predictor.

    ``apply_fn(x: (B, t, t, C_in)) -> (B, t, t, C_out)`` — typically a
    model forward closed over params (t = ``tile`` in blend mode,
    ``tile + overlap`` in halo mode; both must be valid model input sizes).

    Returns ``predict(image: (H, W, C_in)) -> (H, W, C_out)`` logits.
    One compiled program per (H, W) shape; the scan over tile batches keeps
    peak HBM at O(batch_tiles · tile²) regardless of image size.
    ``batch_tiles=None`` (default) auto-sizes to min(tile count, 32) —
    one forward batch per image at 2048²-class sizes, which in halo mode
    also makes assembly a scan-free reshape; pass an int to bound peak
    memory explicitly.

    ``mode``:
      - ``"blend"`` (default): overlapping tiles, cosine-ramp overlap-add —
        the smoothest seams, compute redundancy (tiles·tile²)/(H·W)
        (1.56× at 2048²/512/64).
      - ``"halo"``: non-overlapping output grid; each forward reads
        ``tile + overlap`` of input context (``overlap/2`` halo per side)
        and only the center ``tile`` crop is kept — no blend arithmetic,
        redundancy ((tile+overlap)/tile)² (1.27× at the same config). Seam
        error is bounded by the model's effective receptive field beyond
        ``overlap/2`` pixels; exact vs dense for any model whose receptive
        radius ≤ ``overlap/2`` (tests/test_infer.py). With
        ``batch_tiles ≥`` the tile count, output assembly is a scan-free
        transpose/reshape (PERF.md round 5: 349/365 MPix/s stream-batched
        at halo 32/16).

    ``shard_tiles_axis``: name of a mesh axis to shard each tile batch
    over — the "context parallelism" of images: with ``batch_tiles`` a
    multiple of the axis size and the predictor jitted under a Mesh, every
    chip runs the model on its slice of the tiles and GSPMD gathers the
    logits (call under ``with mesh:``)."""
    if mode not in ("blend", "halo"):
        raise ValueError(f"mode must be 'blend' or 'halo', got {mode!r}")
    if mode == "halo":
        halo = overlap // 2
        if tile % 32 == 0 and halo:
            # keep the model input (tile + 2·halo) divisible by the U-Net
            # total stride (32): halo 8 at tile 64 would feed an 80² tile
            # whose skip/decoder shapes can't concatenate. Rounding up
            # only ever ADDS context (never less accurate).
            halo = -(-halo // 16) * 16
        return _make_halo_predictor(apply_fn, tile, halo,
                                    batch_tiles, shard_tiles_axis)
    stride = tile - overlap

    def predict(image: jnp.ndarray) -> jnp.ndarray:
        h, w, cin = image.shape
        ph, pw = max(tile, h), max(tile, w)
        if ph > h or pw > w:
            # reflect padding requires pad width < dim; for images smaller
            # than ~half the tile fall back to edge replication.
            pad_mode = "reflect" if (ph - h < h and pw - w < w) else "edge"
            image = jnp.pad(image, ((0, ph - h), (0, pw - w), (0, 0)),
                            mode=pad_mode)
        ys = _tile_origins(ph, tile, stride)
        xs = _tile_origins(pw, tile, stride)
        origins = np.stack(np.meshgrid(ys, xs, indexing="ij"),
                           axis=-1).reshape(-1, 2)
        n = origins.shape[0]
        # Adaptive tile-batch size: ``batch_tiles`` is an upper bound; pick
        # the smallest bt with the same number of forward batches so the
        # pad waste is minimal (e.g. 25 tiles, cap 32 → one batch of 25,
        # not 32 — padding cost 28% of the whole run, measured).
        cap = batch_tiles if batch_tiles is not None \
            else min(n, _AUTO_BATCH_CAP)
        n_batches = -(-n // cap)
        bt = -(-n // n_batches)
        n_pad = (-n) % bt
        origins = np.concatenate(
            [origins, np.tile(origins[-1:], (n_pad, 1))])  # dup; weights dedup
        # padded duplicates would double-count their window → zero their
        # weight contribution instead.
        valid = np.concatenate([np.ones(n, np.float32),
                                np.zeros(n_pad, np.float32)])
        origins_d = jnp.asarray(origins.reshape(-1, bt, 2))
        valid_d = jnp.asarray(valid.reshape(-1, bt))
        window = jnp.asarray(_blend_window(tile, overlap))
        # The per-pixel weight total is static geometry — precompute it on
        # the host; the device loop then only accumulates weighted logits
        # (the old code also slice/updated a wacc accumulator per tile:
        # 2× the scatter traffic for a value known at trace time).
        wsum = jnp.asarray(_blend_weight_sum(ph, pw, tile, overlap, ys, xs))

        # probe output channels statically
        cout_probe = jax.eval_shape(
            apply_fn, jax.ShapeDtypeStruct((bt, tile, tile, cin),
                                           image.dtype))
        cout = cout_probe.shape[-1]

        def body(acc, inp):
            orgs, val = inp

            def get_tile(o):
                return jax.lax.dynamic_slice(image, (o[0], o[1], 0),
                                             (tile, tile, cin))

            tiles = jax.vmap(get_tile)(orgs)
            if shard_tiles_axis is not None:
                from jax.sharding import PartitionSpec as P
                tiles = jax.lax.with_sharding_constraint(
                    tiles, P(shard_tiles_axis, None, None, None))
            logits = apply_fn(tiles)
            if shard_tiles_axis is not None:
                from jax.sharding import PartitionSpec as P
                logits = jax.lax.with_sharding_constraint(
                    logits, P(shard_tiles_axis, None, None, None))
            # one vectorized window·validity multiply for the whole batch,
            # instead of bt sequential tile-sized multiplies in the scatter
            logits = logits * (window[None, :, :, None] *
                               val[:, None, None, None])

            def put(acc, args):
                o, lg = args
                patch = jax.lax.dynamic_slice(acc, (o[0], o[1], 0),
                                              (tile, tile, cout))
                acc = jax.lax.dynamic_update_slice(
                    acc, patch + lg, (o[0], o[1], 0))
                return acc, None

            acc, _ = jax.lax.scan(put, acc, (orgs, logits))
            return acc, None

        acc = jnp.zeros((ph, pw, cout), jnp.float32)
        acc, _ = jax.lax.scan(body, acc, (origins_d, valid_d))
        out = acc / wsum
        return out[:h, :w, :]

    return jax.jit(predict)


def _make_halo_predictor(apply_fn: Callable, tile: int, halo: int,
                         batch_tiles: int,
                         shard_tiles_axis: Optional[str]):
    """Halo-exchange tiling: non-overlapping ``tile``-sized output grid;
    each forward sees ``halo`` pixels of extra context per side and only
    the center crop is written back. No blend arithmetic, disjoint
    scatter, redundancy ((tile+2·halo)/tile)². The spatial analog of
    ring-attention's block halo, single-chip form."""
    tin = tile + 2 * halo

    def predict(image: jnp.ndarray) -> jnp.ndarray:
        h, w, cin = image.shape
        ny, nx = -(-h // tile), -(-w // tile)
        ph, pw = ny * tile, nx * tile
        pads = ((halo, ph - h + halo), (halo, pw - w + halo), (0, 0))
        pad_mode = ("reflect" if (ph - h + halo < h and pw - w + halo < w
                                  and halo < h and halo < w) else "edge")
        padded = jnp.pad(image, pads, mode=pad_mode)

        origins = np.stack(np.meshgrid(np.arange(ny) * tile,
                                       np.arange(nx) * tile,
                                       indexing="ij"), -1).reshape(-1, 2)
        n = origins.shape[0]
        cap = batch_tiles if batch_tiles is not None \
            else min(n, _AUTO_BATCH_CAP)
        n_batches = -(-n // cap)
        bt = -(-n // n_batches)
        n_pad = (-n) % bt
        # duplicates rewrite the same disjoint region with the same value
        origins = np.concatenate([origins, np.tile(origins[-1:], (n_pad, 1))])
        origins_d = jnp.asarray(origins.reshape(-1, bt, 2))

        cout_probe = jax.eval_shape(
            apply_fn, jax.ShapeDtypeStruct((bt, tin, tin, cin), image.dtype))
        cout = cout_probe.shape[-1]

        def forward_batch(orgs):
            def get_tile(o):
                # origin o is in OUTPUT coords; the padded image is offset
                # by halo, so the input window starts at o exactly.
                return jax.lax.dynamic_slice(padded, (o[0], o[1], 0),
                                             (tin, tin, cin))

            tiles = jax.vmap(get_tile)(orgs)
            if shard_tiles_axis is not None:
                from jax.sharding import PartitionSpec as P
                tiles = jax.lax.with_sharding_constraint(
                    tiles, P(shard_tiles_axis, None, None, None))
            out = apply_fn(tiles)
            if shard_tiles_axis is not None:
                from jax.sharding import PartitionSpec as P
                out = jax.lax.with_sharding_constraint(
                    out, P(shard_tiles_axis, None, None, None))
            return out[:, halo:halo + tile, halo:halo + tile, :]

        if n_batches == 1:  # implies n_pad == 0 (bt == n)
            # All tiles fit one forward: the disjoint grid assembly is a
            # pure transpose/reshape — no sequential dynamic-update scan
            # at all. Taken whenever the (auto-)batch cap ≥ ny·nx, i.e.
            # by default for ≤32 tiles (16 at 2048²/512); an explicit
            # small ``batch_tiles`` takes the scan path below.
            crop = forward_batch(origins_d[0])
            out = crop.reshape(ny, nx, tile, tile, cout).transpose(
                0, 2, 1, 3, 4).reshape(ph, pw, cout).astype(jnp.float32)
            return out[:h, :w, :]

        def body(acc, orgs):
            crop = forward_batch(orgs)

            def put(acc, args):
                o, lg = args
                return jax.lax.dynamic_update_slice(
                    acc, lg.astype(acc.dtype), (o[0], o[1], 0)), None

            acc, _ = jax.lax.scan(put, acc, (orgs, crop))
            return acc, None

        acc = jnp.zeros((ph, pw, cout), jnp.float32)
        acc, _ = jax.lax.scan(body, acc, origins_d)
        return acc[:h, :w, :]

    return jax.jit(predict)


def make_tiled_predictor_many(apply_fn: Callable, tile: int = 512,
                              overlap: int = 64,
                              batch_tiles: Optional[int] = None,
                              mode: str = "blend"):
    """Stream-batched tiled inference: (B, H, W, C) → (B, H, W, C_out).

    Tiles are batched ACROSS images so the accelerator sees large batches
    even when each image contributes few tiles — on dispatch-latency-heavy
    rigs this recovers the direct-inference throughput for image streams
    (single-image tiled 2048² is dispatch-dominated; see PERF.md)."""
    single = make_tiled_predictor(apply_fn, tile=tile, overlap=overlap,
                                  batch_tiles=batch_tiles, mode=mode)

    @jax.jit
    def predict_many(images: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(single)(images)

    return predict_many


def tiled_predict(model, state, image, tile: int = 512, overlap: int = 64,
                  batch_tiles: Optional[int] = None, tta: bool = False,
                  mode: str = "blend") -> np.ndarray:
    """One-call tiled inference on a single large image (H, W) or (H, W, 1).

    Returns sigmoid probabilities (H, W, n_classes). ``tta=True`` runs
    each (square) tile through its full D4 symmetry average in
    probability space (segtpu/infer/tta.py) before blending — ~8× tile
    compute, same peak memory. ``mode="halo"`` trades cosine blending for
    ~19% less tile compute (see make_tiled_predictor)."""
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        img = img[..., None]

    def apply_fn(x):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, x, train=False)

    from segtpu.infer.predict import output_activation
    act = output_activation(model)  # sigmoid, or channel softmax (n_classes>1)
    if tta:
        from segtpu.infer.tta import d4_average_apply
        predictor = make_tiled_predictor(
            d4_average_apply(apply_fn, out_transform=act),
            tile=tile, overlap=overlap, batch_tiles=batch_tiles, mode=mode)
        return np.asarray(predictor(img))
    predictor = make_tiled_predictor(apply_fn, tile=tile, overlap=overlap,
                                     batch_tiles=batch_tiles, mode=mode)
    logits = predictor(img)
    return np.asarray(act(logits))
