"""High-level fit / predict / evaluate API.

The public one-stop surface demanded by the north star (BASELINE.json:
"public fit/predict/evaluate API and per-pixel mask outputs match the
reference"). Wraps the training engine, data layer, tiled inference and
checkpointing behind a scikit-learn-ish object.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.data.loader import DeviceDataLoader
from segtpu.data.preprocess import load_canonical_images, normalize_canonical
from segtpu.train.engine import TrainState, get_engine
from segtpu.train.loop import quick_train, _materialize, _to_canonical


class Segmenter:
    """Binary cell-segmentation model with the reference's architecture
    options (advanced_models.py:65) behind fit/predict/evaluate.

    Example::

        seg = Segmenter(backbone="resnet34", use_attention=True)
        seg.fit(train_imgs, train_masks, val_imgs, val_masks,
                augmentations_per_image=3)
        masks = seg.predict(test_imgs)            # (N, S, S, 1) uint8
        metrics = seg.evaluate(test_imgs, test_masks)
        seg.save("ckpt_dir")
    """

    def __init__(self, backbone: str = "resnet34", use_attention: bool = True,
                 n_classes: int = 1, config: Optional[Dict] = None):
        self.config = dict(config or {})
        self.config.update({"backbone": backbone,
                            "use_attention": use_attention,
                            "n_classes": n_classes})
        self.config.setdefault("img_size", (128, 128))
        self.config.setdefault("batch_size", 4)
        self.config.setdefault("loss_fn", "combo")
        self.engine = get_engine(self.config)
        self.state: Optional[TrainState] = None
        self.history: Optional[Dict] = None

    # ------------------------------------------------------------- train

    def fit(self, train_images, train_masks, val_images=None, val_masks=None,
            augmentations_per_image: int = 0, **config_overrides
            ) -> "Segmenter":
        """Train with the reference's standard setup (quick_train contract,
        train.py:301-364). Inputs are path lists or canonical uint8 arrays;
        with no val split given, a 80/20 tail split is used."""
        cfg = dict(self.config)
        cfg.update(config_overrides)
        if val_images is None:
            n = len(train_images)
            k = max(1, n // 5)
            val_images, val_masks = train_images[-k:], train_masks[-k:]
            train_images, train_masks = train_images[:-k], train_masks[:-k]
        results = quick_train(
            model=self.engine,
            train_images=train_images, train_masks=train_masks,
            val_images=val_images, val_masks=val_masks, config=cfg,
            augmentations_per_image=augmentations_per_image)
        self.history = results
        self.state = results["state"]
        return self

    # ----------------------------------------------------------- predict

    def _require_state(self) -> TrainState:
        if self.state is None:
            raise RuntimeError("Model is not fitted/loaded yet")
        return self.state

    def _prep_images(self, images) -> jnp.ndarray:
        """Paths / raw uint8 arrays / preprocessed float arrays →
        (N, S, S, 1) float32 model inputs."""
        img_size = tuple(self.config["img_size"])
        if isinstance(images, str):
            raise TypeError("images must be a list of paths or an array, "
                            "not a single string")
        if len(images) == 0:
            raise ValueError("empty image set")
        if isinstance(images[0], str):
            ci = load_canonical_images(list(images), img_size)
            return normalize_canonical(jnp.asarray(ci))
        arr = np.asarray(images)
        if arr.dtype == np.uint8:
            if arr.shape[1:3] != img_size:
                from segtpu.ops.resize import resize_area
                arr = np.stack([np.asarray(
                    jnp.floor(jnp.clip(resize_area(jnp.asarray(a), img_size),
                                       0, 255) + 0.5)).astype(np.uint8)
                    for a in arr])
            return normalize_canonical(jnp.asarray(arr.squeeze(-1)
                                                   if arr.ndim == 4 else arr))
        if arr.ndim == 3:
            arr = arr[..., None]
        return jnp.asarray(arr, jnp.float32)

    def predict_proba(self, images, tta: bool = False,
                      chunk: Optional[int] = None) -> np.ndarray:
        """Probability maps (N, S, S, n_classes): per-pixel sigmoid for
        binary models, channel softmax (summing to 1) when n_classes > 1.

        ``tta=True`` averages over the exact D4 symmetries of the image
        plane (segtpu.infer.tta) — ~8× compute for a typically small but
        consistent IoU gain; not in the reference.

        ``chunk``: process at most ``chunk`` images per device dispatch
        (the last chunk is zero-padded to the same shape, so the WHOLE
        stream reuses ONE compiled program and peak HBM is bounded by the
        chunk) — the production path for arbitrarily long image lists."""
        state = self._require_state()
        x = self._prep_images(images)
        if tta:
            from segtpu.infer.tta import tta_predict_proba
            fn = lambda v: tta_predict_proba(self.engine.model, state, v)
        else:
            from segtpu.infer.predict import predict_proba
            fn = lambda v: predict_proba(self.engine.model, state, v)
        n = x.shape[0]
        if chunk is None or n <= chunk:
            return np.asarray(fn(x))
        # Dispatch every chunk asynchronously and fetch ONCE: through the
        # relay each host fetch costs ~1 s RTT (CLAUDE.md), so a per-chunk
        # np.asarray would turn N/chunk chunks into N/chunk round-trips.
        # Per-dispatch working memory stays bounded by the chunk; only the
        # outputs (the final result, which the caller materializes anyway)
        # accumulate on device.
        outs, pads = [], []
        for i in range(0, n, chunk):
            part = x[i:i + chunk]
            pad = chunk - part.shape[0]
            if pad:
                part = jnp.concatenate(
                    [part, jnp.zeros((pad, *part.shape[1:]), part.dtype)])
            outs.append(fn(part))
            pads.append(pad)
        outs = jax.device_get(outs)
        return np.concatenate([np.asarray(o)[:chunk - p] if p else
                               np.asarray(o) for o, p in zip(outs, pads)])

    def predict(self, images, threshold: float = 0.5,
                post_process_min_size: Optional[int] = None,
                tta: bool = False,
                chunk: Optional[int] = None) -> np.ndarray:
        """Predicted masks (N, S, S, 1) uint8.

        Binary (n_classes == 1): thresholded at the reference's 0.5
        (utils.py:108), optionally with connected-component cleanup
        (utils.py:58-84). Multiclass (n_classes > 1): the softmax ARGMAX
        class index per pixel — ``threshold`` does not apply (pass
        ``predict_proba`` output to custom decision rules instead), and
        ``post_process_min_size`` is a binary-only helper."""
        probs = self.predict_proba(images, tta=tta, chunk=chunk)
        if int(self.config.get("n_classes", 1)) > 1:
            if post_process_min_size is not None:
                raise ValueError(
                    "post_process_min_size removes small BINARY components "
                    "(utils.py:58-84); for multiclass, post-process the "
                    "argmax mask per class yourself")
            return np.argmax(probs, axis=-1).astype(np.uint8)[..., None]
        masks = (probs > threshold).astype(np.uint8)
        if post_process_min_size is not None:
            from segtpu.metrics import post_process
            masks = np.stack([post_process(m[..., 0], post_process_min_size)
                              for m in masks])[..., None]
        return masks

    def predict_tiled(self, image, tile: int = 512, overlap: int = 64,
                      batch_tiles: Optional[int] = None, tta: bool = False,
                      mode: str = "blend") -> np.ndarray:
        """Large-image sliding-window inference. ``mode="blend"``
        (default) cosine-blends overlapping tiles; ``mode="halo"`` keeps
        the center crop of halo-padded tiles — ~19% less compute, 349 vs
        220 MPix/s stream-batched at 2048² (PERF.md round 5).
        ``batch_tiles=None`` auto-sizes the forward batch to the tile
        count (capped at 32); pass an int to bound peak memory.
        ``tta=True`` D4-symmetry-averages each tile (segtpu/infer/tta.py)."""
        from segtpu.infer.tiled import tiled_predict
        return tiled_predict(self.engine.model, self._require_state(), image,
                             tile=tile, overlap=overlap,
                             batch_tiles=batch_tiles, tta=tta, mode=mode)

    # ---------------------------------------------------------- evaluate

    def evaluate(self, images, masks) -> Dict[str, float]:
        """Reference evaluate contract (train.py:71-112): sample-weighted
        loss + confusion metrics on a dataset. For n_classes > 1 the masks
        are integer class labels and the metrics are the macro-averaged
        multiclass ones (losses/multiclass.py::calculate_metrics_multiclass)
        — same keys, so downstream harnesses work unchanged."""
        state = self._require_state()
        img_size = tuple(self.config["img_size"])
        ci, cm = _to_canonical(images, masks, img_size)
        imgs, m = _materialize(ci, cm, int(self.config.get("n_classes", 1)))
        loader = DeviceDataLoader.from_arrays(
            imgs, m, self.config["batch_size"], shuffle=False)
        return self.engine.run_eval_epoch(state, loader)

    def sweep_threshold(self, images, masks, thresholds=None,
                        metric: str = "iou", tta: bool = False,
                        chunk: Optional[int] = None) -> Dict:
        """Evaluate every binarization threshold in one device program and
        return the ``metric``-optimal one (segtpu/metrics/threshold.py).
        Input contract matches :meth:`evaluate`. Typical use::

            sweep = seg.sweep_threshold(val_imgs, val_masks)
            masks = seg.predict(test_imgs, threshold=sweep["best_threshold"])

        ``chunk`` defaults to the config batch_size so the probability
        dispatches have the same peak-HBM profile as :meth:`evaluate`
        (which batches through the loader); pass a larger chunk — or
        explicitly ``chunk=len(images)`` — to trade memory for fewer
        dispatches."""
        self._require_state()
        if int(self.config.get("n_classes", 1)) != 1:
            raise ValueError("sweep_threshold is a binary-segmentation "
                             "helper (n_classes == 1); multiclass masks "
                             "come from the softmax argmax, not a "
                             "threshold")
        img_size = tuple(self.config["img_size"])
        ci, cm = _to_canonical(images, masks, img_size)
        imgs, m = _materialize(ci, cm)
        if chunk is None:
            chunk = int(self.config.get("batch_size", 4))
        probs = self.predict_proba(np.asarray(imgs), tta=tta, chunk=chunk)
        from segtpu.metrics.threshold import sweep_thresholds
        return sweep_thresholds(probs, m, thresholds=thresholds,
                                metric=metric)

    # ------------------------------------------------------- persistence

    def save(self, path: str, name: str = "segmenter") -> str:
        """Checkpoint weights (Orbax) plus a JSON sidecar with the model
        config, so a checkpoint is self-describing: ``from_checkpoint``
        rebuilds the right architecture without the caller re-specifying
        backbone/attention/img_size."""
        import json
        import os
        from segtpu.train.checkpoint import save_checkpoint
        state = self._require_state()
        out = save_checkpoint(path, {"params": state.params,
                                     "batch_stats": state.batch_stats,
                                     "config": {}}, name=name)
        cfg = {k: (list(v) if isinstance(v, tuple) else v)
               for k, v in self.config.items()
               if isinstance(v, (str, int, float, bool, list, tuple))
               or v is None}
        with open(os.path.join(path, f"{name}_config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
        return out

    # Sidecar keys load() may restore: everything that determines the
    # built architecture (get_engine's model_key) plus img_size. Training
    # hyperparameters (num_epochs, batch_size, lr, fold_parallel, ...)
    # stay the CALLER's — load() restores weights, not their training
    # plan; full-config restore lives in from_checkpoint only.
    _ARCH_KEYS = ("backbone", "use_attention", "n_classes", "img_size",
                  "dtype", "final_bias_prior", "fuse", "remat",
                  "reparam_in_train", "fuse_gate")

    def load(self, path: str, name: str = "segmenter") -> "Segmenter":
        """Restore weights saved by :meth:`save`. If the sidecar config is
        present and names a different architecture, the engine is rebuilt
        to match (older checkpoints without a sidecar load as before).
        Only architecture-determining keys are taken from the sidecar —
        the caller's training settings are left untouched."""
        import json
        import os
        from segtpu.train.checkpoint import load_checkpoint
        cfg_path = os.path.join(path, f"{name}_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            if "img_size" in cfg:
                cfg["img_size"] = tuple(cfg["img_size"])
            self.config.update({k: cfg[k] for k in self._ARCH_KEYS
                                if k in cfg})
            self.engine = get_engine(self.config)
        restored = load_checkpoint(path, name=name)
        params = jax.tree.map(jnp.asarray, restored["params"])
        stats = jax.tree.map(jnp.asarray, restored["batch_stats"])
        self.state = TrainState(params=params, batch_stats=stats,
                                opt_state=None)
        return self

    @classmethod
    def from_checkpoint(cls, path: str, name: str = "segmenter"
                        ) -> "Segmenter":
        """One-call restore: architecture from the checkpoint's config
        sidecar, weights from Orbax."""
        import json
        import os
        cfg_path = os.path.join(path, f"{name}_config.json")
        kw = {}
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            if "img_size" in cfg:   # JSON turned the tuple into a list
                cfg["img_size"] = tuple(cfg["img_size"])
            kw = {k: cfg[k] for k in
                  ("backbone", "use_attention", "n_classes") if k in cfg}
            kw["config"] = cfg
        return cls(**kw).load(path, name=name)

    def export(self, path: str, batch: Optional[int] = None,
               platforms: Optional[Sequence[str]] = None) -> str:
        """Write a self-contained AOT serving artifact (StableHLO via
        jax.export, weights baked in, symbolic batch by default) loadable
        with ``segtpu.infer.load_serving`` — no model code needed at the
        deployment site. See segtpu/infer/export.py."""
        from segtpu.infer.export import save_serving
        state = self._require_state()
        return save_serving(path, self.engine.model, state.params,
                            state.batch_stats,
                            tuple(self.config["img_size"]),
                            batch=batch, platforms=platforms)

    def load_pretrained_encoder(self, checkpoint_path: str) -> "Segmenter":
        """pretrained=True path: overlay torchvision encoder weights from a
        local torch checkpoint (advanced_models.py:73-139 behavior)."""
        from segtpu.models.torch_convert import load_pretrained
        img_size = tuple(self.config["img_size"])
        params, stats = load_pretrained(
            self.engine.model, jax.random.key(self.config.get("seed", 0)),
            (1, *img_size, 1), checkpoint_path, kind="torchvision")
        lr = self.config.get("learning_rate", 1e-3)
        wd = self.config.get("weight_decay", 1e-5)
        opt_state = self.engine.tx.init(params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_state.hyperparams["weight_decay"] = jnp.asarray(wd, jnp.float32)
        self.state = TrainState(params=params, batch_stats=stats,
                                opt_state=opt_state)
        return self
