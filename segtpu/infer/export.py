"""AOT serving export — the fitted model as a portable StableHLO artifact.

Production-deployment surface the reference does not have (its only
persistence is a ``torch.save(state_dict)`` helper, utils.py:192-195,
which requires the full model source tree at load time). Here the entire
inference graph — normalized input → U-Net forward (inference BN) →
sigmoid — is serialized with ``jax.export``:

- **weights are baked in** as constants: one self-contained artifact,
  no segtpu model code or Python class needed to serve it;
- the batch dimension is exported **symbolically** by default, so one
  artifact serves any batch size (shape polymorphism);
- the artifact can be lowered for several platforms at once
  (``platforms=("tpu", "cpu")``) and runs under ``jax.jit`` on whichever
  backend loads it — TPU pods and CPU canaries serve the same bytes.

Format: a directory with ``model.stablehlo`` (the serialized
``jax.export.Exported``) and ``meta.json`` (image size, dtype, platforms,
format version) for tooling that wants to introspect without JAX.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

FORMAT_VERSION = 1
_ARTIFACT = "model.stablehlo"
_META = "meta.json"


def output_activation_name(model) -> str:
    """'sigmoid' for binary heads, 'softmax' for n_classes > 1 — recorded
    in meta.json so ServingModel decodes masks the right way."""
    return "softmax" if getattr(model, "n_classes", 1) > 1 else "sigmoid"


def make_serving_fn(model, params, batch_stats, with_sigmoid: bool = True):
    """The inference graph served in production: model forward in eval mode
    (running BN stats, advanced_models.py:283-357 contract) plus the
    output activation the live API applies at prediction time — sigmoid
    for binary heads (utils.py:105-108), channel softmax for multiclass
    (``with_sigmoid`` keeps its historical name but means "apply the
    model's output activation"; False exports raw logits, e.g. for tiled
    composition). Weights are closed over, so ``jax.export`` bakes them
    into the artifact as constants."""
    from segtpu.infer.predict import output_activation
    act = output_activation(model)

    def serve(x):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        if with_sigmoid:
            return act(logits.astype(jnp.float32))
        return logits.astype(jnp.float32)

    return serve


def export_serving(model, params, batch_stats,
                   img_size: Tuple[int, int],
                   batch: Optional[int] = None,
                   dtype=jnp.float32,
                   platforms: Optional[Sequence[str]] = None,
                   with_sigmoid: bool = True) -> "jax_export.Exported":
    """Export the model's serving graph.

    ``batch=None`` (default) exports a symbolic batch dimension — the
    artifact accepts any leading batch size. ``platforms=None`` exports
    for the current default backend; pass e.g. ``("tpu", "cpu")`` for a
    multi-platform artifact."""
    serve = jax.jit(make_serving_fn(model, params, batch_stats,
                                    with_sigmoid=with_sigmoid))
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        shape = (b, *img_size, 1)
    else:
        shape = (int(batch), *img_size, 1)
    spec = jax.ShapeDtypeStruct(shape, dtype)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(serve, **kwargs)(spec)


def save_serving(path: str, model, params, batch_stats,
                 img_size: Tuple[int, int],
                 batch: Optional[int] = None,
                 dtype=jnp.float32,
                 platforms: Optional[Sequence[str]] = None) -> str:
    """Export and write the serving artifact directory; returns ``path``."""
    exp = export_serving(model, params, batch_stats, img_size, batch=batch,
                         dtype=dtype, platforms=platforms)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT), "wb") as f:
        f.write(exp.serialize())
    activation = output_activation_name(model)
    meta = {
        "format_version": FORMAT_VERSION,
        "img_size": list(img_size),
        "batch": batch,
        "dtype": jnp.dtype(dtype).name,
        "platforms": list(exp.platforms),
        "activation": activation,
        "n_classes": int(getattr(model, "n_classes", 1)),
        "input": "normalized float (N, H, W, 1), values in [0, 1]",
        "output": f"{activation} probabilities (N, H, W, n_classes) "
                  f"float32",
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=2)
    return path


class ServingModel:
    """A deployed artifact: loads the serialized graph and serves batches.

    Needs only JAX — no segtpu model code, no flax, no checkpoint
    reconstruction::

        sm = ServingModel("artifact_dir")
        probs = sm.predict_proba(batch)       # any batch size
        masks = sm.predict(batch)             # 0.5-threshold uint8
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _META)) as f:
            self.meta: Dict = json.load(f)
        if self.meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} is newer "
                f"than this library supports ({FORMAT_VERSION})")
        with open(os.path.join(path, _ARTIFACT), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        self._call = jax.jit(self._exported.call)
        self.img_size = tuple(self.meta["img_size"])
        # pre-"activation"-field artifacts (format 1 early) were all binary
        self.activation = self.meta.get("activation", "sigmoid")
        self.n_classes = int(self.meta.get("n_classes", 1))
        self._tiled_cache: Dict = {}

    def predict_proba(self, images) -> np.ndarray:
        """(N, H, W[, 1]) normalized float images → (N, H, W, C) float32
        probabilities (sigmoid, or channel softmax for multiclass
        artifacts — ``meta["activation"]``)."""
        x = jnp.asarray(images)
        if x.ndim == 3:
            x = x[..., None]
        if tuple(x.shape[1:3]) != self.img_size:
            raise ValueError(
                f"expected {self.img_size} images, got {x.shape[1:3]} — "
                f"resize/preprocess to the exported size first")
        if x.ndim != 4 or x.shape[-1] != 1:
            raise ValueError(
                f"expected grayscale (N, H, W[, 1]) input, got {x.shape} — "
                f"the artifact was exported for 1-channel images")
        x = x.astype(jnp.dtype(self.meta["dtype"]))
        return np.asarray(self._call(x))

    def predict(self, images, threshold: float = 0.5) -> np.ndarray:
        """Binary artifacts: masks at the reference's 0.5 threshold
        (utils.py:108). Multiclass artifacts: the softmax ARGMAX class
        index per pixel, (N, H, W, 1) uint8 — ``threshold`` does not
        apply (same contract as ``Segmenter.predict``)."""
        probs = self.predict_proba(images)
        if self.activation == "softmax":
            return np.argmax(probs, axis=-1).astype(np.uint8)[..., None]
        return (probs > threshold).astype(np.uint8)

    # ---- whole-slide serving: tiled inference ON the artifact ----------

    def _tiled_fn(self, overlap: int, mode: str, batch_tiles):
        """Build (and cache) a batched tiled predictor whose per-tile
        forward IS the exported graph — large images served without any
        segtpu model code, matching the library tiled path exactly in
        halo mode (tests/test_export.py).

        Geometry: the artifact's spatial size is FIXED at export time, so
        the tile grid is derived from it rather than the other way round —
        halo mode crops ``overlap//2`` context per side off each
        ``img_size`` forward (output grid ``img_size − overlap``); blend
        mode overlap-adds full ``img_size`` tiles. The reference has no
        large-image path at all (it resizes, dataset.py:50-51)."""
        key = (int(overlap), mode, batch_tiles)
        fn = self._tiled_cache.get(key)
        if fn is not None:
            return fn
        s0, s1 = self.img_size
        if s0 != s1:
            raise ValueError(
                f"tiled serving needs a square artifact, got img_size "
                f"{self.img_size} — re-export at a square tile size")
        in_dtype = jnp.dtype(self.meta["dtype"])

        def apply_fn(tiles):
            return self._exported.call(tiles.astype(in_dtype))

        if mode == "halo":
            halo = int(overlap) // 2
            tile = s0 - 2 * halo
            if halo <= 0 or tile <= 0:
                raise ValueError(
                    f"halo overlap {overlap} is invalid for a {s0}² "
                    f"artifact (need 0 < overlap//2 < {s0 // 2})")
            from segtpu.infer.tiled import _make_halo_predictor
            # direct construction: the public make_tiled_predictor derives
            # the model-input size as tile + 2·halo, but here the model
            # input is pinned to s0 by the export — so tile is the derived
            # quantity and the stride-32 halo rounding must not move it.
            single = _make_halo_predictor(apply_fn, tile, halo,
                                          batch_tiles, None)
        elif mode == "blend":
            from segtpu.infer.tiled import make_tiled_predictor
            single = make_tiled_predictor(apply_fn, tile=s0,
                                          overlap=int(overlap),
                                          batch_tiles=batch_tiles,
                                          mode="blend")
        else:
            raise ValueError(f"mode must be 'halo' or 'blend', got {mode!r}")
        # call_exported has no vmap batching rule → images in a request
        # are mapped sequentially; each image's tiles are still one
        # batched forward (the MXU-relevant axis).
        fn = jax.jit(lambda imgs: jax.lax.map(single, imgs))
        self._tiled_cache[key] = fn
        return fn

    def predict_proba_tiled(self, images, overlap: int = 32,
                            mode: str = "halo",
                            batch_tiles=None) -> np.ndarray:
        """(N, H, W[, 1]) images of ANY spatial size → (N, H, W, C)
        probabilities via sliding-window tiling over the fixed-size
        artifact.

        ``mode="halo"`` (default — the measured throughput preset,
        PERF.md round 5): non-overlapping output grid, each forward sees
        ``overlap//2`` pixels of context per side and only the center
        crop is kept; the composition is EXACT per-tile artifact output
        (no arithmetic on probabilities). ``mode="blend"``: cosine-ramp
        overlap-add — since the artifact emits probabilities, this
        averages probabilities across overlaps (the same semantics as TTA
        probability averaging), trading exact-composition for smoother
        seams. One compiled program per input shape."""
        x = jnp.asarray(images)
        if x.ndim == 3:
            x = x[..., None]
        if x.ndim != 4 or x.shape[-1] != 1:
            raise ValueError(
                f"expected grayscale (N, H, W[, 1]) input, got {x.shape}")
        fn = self._tiled_fn(overlap, mode, batch_tiles)
        return np.asarray(fn(x))

    def predict_tiled(self, images, threshold: float = 0.5,
                      overlap: int = 32, mode: str = "halo",
                      batch_tiles=None) -> np.ndarray:
        """Tiled counterpart of ``predict``: binary masks at ``threshold``
        (or per-pixel argmax class ids for softmax artifacts)."""
        probs = self.predict_proba_tiled(images, overlap=overlap, mode=mode,
                                         batch_tiles=batch_tiles)
        if self.activation == "softmax":
            return np.argmax(probs, axis=-1).astype(np.uint8)[..., None]
        return (probs > threshold).astype(np.uint8)


def load_serving(path: str) -> ServingModel:
    return ServingModel(path)
