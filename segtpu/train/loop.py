"""Training orchestration: ``train_model`` / ``quick_train``.

Reference parity: train.py:115-364 — same contract (plateau LR on val IoU,
early stopping, best-weights tracking and restore, identical result-dict
schema, optional training-curve plots) on top of the jit-compiled epoch
engine. Differences by design (all TPU-side wins, not behavior changes):

- Data (paths or canonical arrays) is materialized once into HBM; the
  augmented training set is generated on device (no temp_augmentation/ disk
  round trip, dataset.py:156-202).
- An epoch is one ``lax.scan`` program; host work per epoch is two scalar
  fetches (train/val metric vectors).
- best weights are device-array references (no deepcopy; JAX arrays are
  immutable), restored at the end (train.py:207-226).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.data.augment import CellAugmenter
from segtpu.data.loader import DeviceDataLoader
from segtpu.data.preprocess import load_canonical, normalize_canonical
from segtpu.train.engine import (METRIC_KEYS, TrainEngine, TrainState,
                                 auto_pipeline_window, get_engine,
                                 tree_bytes)
from segtpu.train.optim import EarlyStopping, ReduceLROnPlateau

ArraysOrPaths = Union[Sequence[str], Tuple[np.ndarray, np.ndarray]]


def _to_canonical(images, masks, img_size):
    """Accept path lists (reference API) or pre-resized canonical uint8
    arrays; return (imgs_u8 (N,S,S), masks_u8 (N,S,S)).

    Fail-fast validation: a bare string (would be iterated char-by-char)
    or an empty training set otherwise dies deep inside decode/augment
    with baffling errors."""
    if isinstance(images, str) or isinstance(masks, str):
        raise TypeError(
            "images/masks must be a list of paths (or a canonical uint8 "
            "array), not a single string — note load_original_data returns "
            "a dict: use d['image_paths'], d['mask_paths']")
    if len(images) == 0:
        raise ValueError("empty image set: no training/validation images "
                         "were provided (check data_dir and image_type)")
    if len(images) != len(masks):
        raise ValueError(f"images/masks length mismatch: {len(images)} "
                         f"vs {len(masks)}")
    if isinstance(images[0], str):
        return load_canonical(list(images), list(masks), img_size)
    return np.asarray(images), np.asarray(masks)


def _materialize(imgs_u8, masks_u8, n_classes: int = 1):
    """Canonical uint8 → normalized device arrays.

    Binary (default): masks binarize to {0,1} float with a channel dim —
    the reference's contract (dataset.py:63). Multiclass (n_classes > 1):
    masks are INTEGER CLASS LABELS and pass through un-binarized (the
    softmax losses/metrics take float labels, losses/multiclass.py)."""
    imgs = normalize_canonical(jnp.asarray(imgs_u8))
    m = jnp.asarray(masks_u8)
    if n_classes > 1:
        masks = m.astype(jnp.float32)
        if masks.ndim == imgs.ndim - 1:
            masks = masks[..., None]
        return imgs, masks
    masks = (m > 0).astype(jnp.float32)
    if masks.ndim == imgs.ndim - 1:
        masks = masks[..., None]
    return imgs, masks


@jax.jit
def _ema_update(ema, params, decay):
    """One Polyak-averaging step: ema ← decay·ema + (1−decay)·params.

    Traced once per params structure; called per epoch as a pure async
    device op, so EMA tracking adds zero host syncs to the pipelined
    window (the whole point of epoch pipelining on the ~1 s-RTT relay)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema, params)


BCE_FAMILY_LOSSES = frozenset({
    "bce", "weighted_bce", "balanced_bce", "focal", "distance_map_bce",
    "boundary",
})


def _auto_final_bias(engine: TrainEngine, state: TrainState, config: Dict,
                     tr_masks, verbose: bool) -> TrainState:
    """Initialize the final-conv bias to the training-set foreground logit
    when training FROM SCRATCH (no initial_state, no explicit
    ``final_bias_prior`` in config) with a purely per-pixel CE-family loss
    (``BCE_FAMILY_LOSSES``).

    Why: with torch-default zero bias on heavily imbalanced masks, plain
    BCE/weighted-BCE sink into the all-background local minimum and stall
    at IoU≈0 (measured: the round-2 reference-scale loss sweep, PERF.md).
    The reference never hits this because its encoders are ImageNet-
    pretrained (advanced_models.py:72-78) — no such checkpoints exist in
    this container. Setting bias = log(p/(1−p)) makes the initial predicted
    foreground rate match the data (the standard imbalanced-seg init,
    cf. focal-loss §3.3 prior initialization).

    Why NOT for losses with a region/overlap term (dice, combo, tversky…):
    their gradient already escapes all-background, and the prior
    measurably DELAYS crossing the 0.5 prediction threshold — on the
    synthetic fixture a 5-epoch combo run reaches IoU 0.26 with zero bias
    but is still at IoU 0 (all probabilities < 0.5) with bias=logit(fg).
    So the prior is scoped to the CE family that needs it.

    Applied as STATE surgery, not a model hyperparameter, so the engine
    cache (keyed on model config) still shares one compiled program across
    folds/datasets with different foreground ratios. Opt out with
    ``config={'final_bias_prior': None}`` (torch-default zeros, reference
    parity); an explicit float is baked into the model as before
    (segtpu/models/unet.py:141)."""
    if "final_bias_prior" in config:      # explicit value or explicit None:
        return state                      # the model init already honored it
    if getattr(engine.model, "n_classes", 1) != 1:
        return state                      # binary-fg prior only
    if config.get("loss_fn", "combo") not in BCE_FAMILY_LOSSES:
        return state                      # region-term losses don't stall
    import math
    p = float(np.clip(float(jnp.mean(tr_masks)), 1e-4, 1.0 - 1e-4))
    b = math.log(p / (1.0 - p))
    try:  # flax params are plain nested dicts; shallow-copy the spine
        cf = dict(state.params["conv_final"])
        cf["bias"] = jnp.full_like(cf["bias"], b)
        params = dict(state.params)
        params["conv_final"] = cf
    except (KeyError, TypeError):
        return state
    if verbose:
        print(f"From-scratch init: final bias set to foreground prior "
              f"logit({p:.4f}) = {b:.3f}")
    return state.replace(params=params)


def _resolve_ckpt(config: Dict, engine: TrainEngine):
    """Encoder checkpoint for THIS engine's backbone (path, mapping entry,
    or None)."""
    from segtpu.models.torch_convert import resolve_encoder_checkpoint
    return resolve_encoder_checkpoint(config.get("encoder_checkpoint"),
                                      engine.model.backbone)


def train_model(model=None, train_images: ArraysOrPaths = (),
                train_masks: ArraysOrPaths = (),
                val_images: ArraysOrPaths = (),
                val_masks: ArraysOrPaths = (),
                criterion: Optional[Callable] = None,
                optimizer: Optional[Dict] = None,
                scheduler: Optional[ReduceLROnPlateau] = None,
                num_epochs: int = 50, device=None, config: Dict = None,
                augmentations_per_image: int = 0,
                save_plots: bool = True, initial_state=None) -> Dict:
    """Complete training loop with validation, augmentation and tracking
    (reference: train_model, train.py:115-244).

    ``model``: a TrainEngine, or None (built from config: backbone,
    use_attention, n_classes). ``optimizer``: optional dict overriding
    {'learning_rate', 'weight_decay'}. ``scheduler``: ReduceLROnPlateau or
    None (no schedule). ``device`` is accepted for API parity and ignored
    (JAX places arrays). ``initial_state``: optional TrainState to train
    FROM (converted/pretrained/resumed weights) — the analog of the
    reference training whatever weights the passed torch model carries;
    without it a fresh seed-derived init is used.

    Returns the reference's result schema: train_metrics, val_metrics,
    lr_history, best_iou, best_epoch, best_model_state, training_time,
    final_train_metrics, final_val_metrics.
    """
    config = dict(config or {})
    img_size = tuple(config.get("img_size", (256, 256)))
    batch_size = int(config.get("batch_size", 2))
    verbose = config.get("verbose", True)
    seed = int(config.get("seed", 0))

    engine = model if isinstance(model, TrainEngine) else \
        get_engine(config, criterion)

    # ---- data: canonical → (augment) → normalized device arrays
    n_classes = int(config.get("n_classes", 1))
    tr_ci, tr_cm = _to_canonical(train_images, train_masks, img_size)
    va_ci, va_cm = _to_canonical(val_images, val_masks, img_size)
    if n_classes > 1:
        hi = max(int(np.asarray(tr_cm).max(initial=0)),
                 int(np.asarray(va_cm).max(initial=0)))
        if hi >= n_classes:
            raise ValueError(
                f"multiclass masks must hold integer labels in "
                f"[0, n_classes); found label {hi} with "
                f"n_classes={n_classes}")

    augmenter = CellAugmenter(augmentations_per_image, seed=seed,
                              n_classes=n_classes)
    if augmentations_per_image > 0:
        tr_ci, tr_cm = augmenter.augment_training_data(tr_ci, tr_cm)

    tr_imgs, tr_masks = _materialize(tr_ci, tr_cm, n_classes)
    va_imgs, va_masks = _materialize(va_ci, va_cm, n_classes)

    train_loader = DeviceDataLoader.from_arrays(
        tr_imgs, tr_masks, batch_size, shuffle=True, seed=seed)
    val_loader = DeviceDataLoader.from_arrays(
        va_imgs, va_masks, batch_size, shuffle=False)

    # ---- optimizer hyperparams (train.py:331-335 defaults)
    opt = dict(optimizer or {})
    lr = float(opt.get("learning_rate", config.get("learning_rate", 1e-3)))
    wd = float(opt.get("weight_decay", config.get("weight_decay", 1e-5)))

    if initial_state is not None:
        # keep the caller's params/batch_stats; rebuild opt state with the
        # requested hyperparams (a fresh optimizer, as the reference does
        # when handed a model with loaded weights, train.py:301-364).
        # Hyperparams are set directly — a full engine.init_state here
        # would run a throwaway parameter init/compile just to produce
        # two scalars.
        opt_state = engine.tx.init(initial_state.params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)
        opt_state.hyperparams["weight_decay"] = jnp.asarray(
            wd, jnp.float32)
        state = initial_state.replace(opt_state=opt_state)
    elif _resolve_ckpt(config, engine):
        # pretrained=True with a user-supplied local torchvision
        # checkpoint (advanced_models.py:72-78 behavior): seed-derived
        # fresh init, then the converted encoder overlaid. Flows through
        # CrossValidator/ModelComparator/experiments as a plain config
        # key (a {backbone: path} mapping for multi-backbone grids) —
        # see tools/validate_reference_parity.py.
        from segtpu.models.torch_convert import load_pretrained
        params, stats = load_pretrained(
            engine.model, jax.random.key(seed), (1, *img_size, 1),
            _resolve_ckpt(config, engine),
            kind=config.get("checkpoint_kind", "torchvision"))
        state = engine.state_from(params, stats, lr, wd)
    else:
        state = engine.init_state(jax.random.key(seed), (1, *img_size, 1),
                                  lr, wd)
        state = _auto_final_bias(engine, state, config, tr_masks, verbose)

    # Whole-run fusion fast path (segtpu/train/fused_run.py): the entire
    # epoch loop — shuffling, plateau LR, early stopping, best weights —
    # compiles into ONE device program. Opt-in via config fused_run=True;
    # requires the standard (None or max-mode plateau) scheduler.
    if (config.get("fused_run") and not config.get("warmup_epochs")
            and config.get("ema_decay") is None
            and config.get("lr_schedule", "plateau") == "plateau" and (
            scheduler is None or (isinstance(scheduler, ReduceLROnPlateau)
                                  and scheduler.mode == "max"))):
        return _train_model_fused(engine, state, tr_imgs, tr_masks, va_imgs,
                                  va_masks, batch_size, num_epochs, lr,
                                  scheduler, config, augmenter, verbose)

    train_metrics_history: List[Dict] = []
    val_metrics_history: List[Dict] = []
    lr_history: List[float] = []
    best_iou = 0.0
    best_state: Optional[Tuple] = None
    best_epoch = 0

    early_stopping = EarlyStopping(
        patience=config.get("early_stopping_patience", 7),
        min_delta=config.get("early_stopping_min_delta", 0.001))

    if verbose:
        print("Starting training...")
    start_time = time.time()

    # observability (SURVEY.md §5): structured JSONL metrics + NaN guard
    from segtpu.core.logging import MetricsLogger
    logger = MetricsLogger(config.get("metrics_log"), echo=False) \
        if config.get("metrics_log") else None
    tb = None
    if config.get("tensorboard_dir"):
        from segtpu.core.tboard import TBWriter
        tb = TBWriter(config["tensorboard_dir"])
    debug_nans = bool(config.get("debug_nans", False))
    # tb/logger/augmenter are released even when the epoch loop
    # raises (debug_nans FloatingPointError, device errors): the
    # per-event flush means only the handles would leak, but a
    # long-lived caller (CV sweep) must not accumulate them.
    try:

        # Weight EMA (config ``ema_decay``, default off — not in the
        # reference): Polyak-average the params once per EPOCH, initialized at
        # the starting weights. Per-epoch (not per-step) granularity keeps
        # TrainState and every cached compiled program unchanged, and at
        # typical decays (0.8-0.95 over tens of epochs) matches the usual
        # per-step EMA smoothing scale. The averaged weights are evaluated
        # once at the end (``ema_val_metrics``) and returned as ``ema_state``;
        # they are NEVER silently adopted — the caller compares vs best_iou.
        ema_decay = config.get("ema_decay")
        ema_params = None
        if ema_decay is not None:
            ema_decay = float(ema_decay)
            if not 0.0 <= ema_decay < 1.0:
                raise ValueError(f"ema_decay must be in [0, 1), got {ema_decay}")
            ema_params = state.params
            ema_decay_arr = jnp.float32(ema_decay)  # one transfer, not per epoch

        # Epoch pipelining (TPU-relay-native): the per-epoch host fetch costs a
        # full relay round-trip (~1 s RTT) that dominates small-epoch trainings.
        # The plateau scheduler and early stopper are patience counters, so from
        # their CURRENT state a no-event horizon is provable: the next
        # `scheduler.safe_horizon()` epochs must train at the current LR and a
        # stop can only land on the last of `early_stopping.safe_horizon()`
        # dispatches. Dispatching that whole window back-to-back and fetching
        # ALL its metric totals in ONE device_get divides the RTT bill by the
        # window size with ZERO mis-speculation — numerics are bit-identical to
        # the per-epoch loop (same programs, same inputs, same key chain).
        # `pipeline_epochs` caps the window; 1 disables pipelining. Memory:
        # each in-flight epoch pins its params/batch_stats snapshot plus its
        # queued program's inputs (a shuffled dataset view) until it runs —
        # so unless pipeline_epochs is set explicitly, the window is sized
        # from those bytes against an HBM budget (auto_pipeline_window): at
        # HBM-tight scales (512² flagship training) this auto-reduces to 1-2
        # instead of silently OOMing at the old fixed default of 4.
        per_epoch_bytes = tree_bytes(state.params, state.batch_stats,
                                     tr_imgs, tr_masks)
        pipeline = auto_pipeline_window(config, per_epoch_bytes)

        # Linear LR warmup (config ``warmup_epochs``, default 0 — the
        # reference has none): epoch e in 1..W trains at lr·e/W, and the
        # plateau scheduler only engages after the ramp (patience counters
        # are meaningless mid-ramp). Each warmup epoch has its own LR, so
        # the pipeline window is 1 there; mirrored in the fold-parallel loop
        # (segtpu/eval/fold_parallel.py) for sequential/parallel parity.
        warmup_epochs = int(config.get("warmup_epochs", 0))
        base_lr = lr

        # Cosine LR decay (config ``lr_schedule: "cosine"`` — new; the
        # reference only has plateau): after the warmup ramp, epoch e runs at
        # min_lr + (base_lr-min_lr)/2 · (1 + cos(π·(e-W)/(E-W))). The
        # schedule is metric-INDEPENDENT, so unlike plateau every epoch's LR
        # is known at dispatch time and the window pipelines at full depth
        # with per-epoch LRs (the TPU-native win: zero extra host syncs). A
        # passed plateau scheduler is ignored under cosine.
        schedule = str(config.get("lr_schedule", "plateau")).lower()
        if schedule not in ("plateau", "cosine"):
            raise ValueError(
                f"Unknown lr_schedule '{schedule}' (plateau|cosine)")
        if schedule == "cosine":
            scheduler = None
            cos_min_lr = float(config.get("min_lr", 1e-6))
            cos_span = max(1, num_epochs - warmup_epochs)

            def _cos_lr(e: int) -> float:
                import math
                return cos_min_lr + 0.5 * (base_lr - cos_min_lr) * (
                    1.0 + math.cos(math.pi * (e - warmup_epochs) / cos_span))

        shuffle_key = jax.random.key(seed + 1)
        train_metrics: Dict = {}
        val_metrics: Dict = {}
        epoch = 0
        stopped = False
        while epoch < num_epochs and not stopped:
            if epoch < warmup_epochs:
                h = 1
                lr = base_lr * (epoch + 1) / warmup_epochs
            else:
                h = min(pipeline, num_epochs - epoch,
                        early_stopping.safe_horizon())
                if scheduler is not None:
                    # duck-typed schedulers (only .step()) pipeline at depth
                    # 1 — their event timing is unknowable ahead of the
                    # metrics
                    h = min(h, getattr(scheduler, "safe_horizon", lambda: 1)())
            window = []
            window_lrs = []
            for i in range(h):
                if schedule == "cosine" and epoch + i >= warmup_epochs:
                    lr = _cos_lr(epoch + i)
                window_lrs.append(lr)
                shuffle_key, sk = jax.random.split(shuffle_key)
                state, tt, vt = engine.run_train_and_eval_epoch_async(
                    state, train_loader, val_loader, lr, sk)
                if ema_params is not None:
                    # async tree op on the dispatch queue; the early-stop
                    # horizon bound guarantees every dispatched epoch executes,
                    # so EMA over dispatched == EMA over executed epochs
                    ema_params = _ema_update(ema_params, state.params,
                                             ema_decay_arr)
                # retain only what the controllers need (params/batch_stats
                # for best-weight snapshots, the metric totals): holding each
                # in-flight epoch's full TrainState would pin h Adam moment
                # sets for no reader
                window.append((state.params, state.batch_stats, tt, vt))
            # ONE host↔device sync for the whole window
            fetched = jax.device_get([(tt, vt) for _, _, tt, vt in window])
            for wlr, (wparams, wstats, _, _), (tvals, vvals) in zip(
                    window_lrs, window, fetched):
                train_metrics = dict(zip(
                    METRIC_KEYS, map(float, np.asarray(tvals) / train_loader.n)))
                val_metrics = dict(zip(
                    METRIC_KEYS, map(float, np.asarray(vvals) / val_loader.n)))
                train_metrics_history.append(train_metrics)
                val_metrics_history.append(val_metrics)

                if debug_nans and not (np.isfinite(train_metrics["loss"])
                                       and np.isfinite(val_metrics["loss"])):
                    raise FloatingPointError(
                        f"Non-finite loss at epoch {epoch+1}: "
                        f"train={train_metrics['loss']}, "
                        f"val={val_metrics['loss']}")

                if scheduler is not None and epoch + 1 > warmup_epochs:
                    lr = scheduler.step(val_metrics["iou"])
                # under cosine the history records the LR the epoch actually
                # ran at; under plateau, the post-step LR (torch convention)
                shown_lr = wlr if schedule == "cosine" else lr
                lr_history.append(shown_lr)

                if logger is not None:
                    logger.log({"epoch": epoch, "lr": shown_lr,
                                **{f"train_{k}": v
                                   for k, v in train_metrics.items()},
                                **{f"val_{k}": v
                                   for k, v in val_metrics.items()}},
                               kind="epoch")
                if tb is not None:
                    tb.add_scalars(
                        {"lr": shown_lr,
                         **{f"train/{k}": v for k, v in train_metrics.items()},
                         **{f"val/{k}": v for k, v in val_metrics.items()}},
                        step=epoch)

                if verbose:
                    print(f"Epoch {epoch+1:3d}/{num_epochs} - "
                          f"Train Loss: {train_metrics['loss']:.4f}, "
                          f"Train IoU: {train_metrics['iou']:.4f}, "
                          f"Val Loss: {val_metrics['loss']:.4f}, "
                          f"Val IoU: {val_metrics['iou']:.4f}, "
                          f"LR: {shown_lr:.6f}")

                if val_metrics["iou"] > best_iou:
                    best_iou = val_metrics["iou"]
                    best_state = (wparams, wstats)
                    best_epoch = epoch

                epoch += 1
                if early_stopping.step(val_metrics["iou"]):
                    if verbose:
                        print(f"Early stopping triggered at epoch {epoch}")
                    stopped = True
                    # by the horizon bound this is the last window epoch, so
                    # `state` (the dispatch chain tail) already holds it; the
                    # replace is defensive for a mid-window stop
                    state = state.replace(params=wparams, batch_stats=wstats)
                    break

        time_elapsed = time.time() - start_time
        if verbose:
            print(f"Training complete in {time_elapsed // 60:.0f}m "
                  f"{time_elapsed % 60:.0f}s")
            print(f"Best validation IoU: {best_iou:.4f} at epoch {best_epoch+1}")

        # EMA weights are evaluated BEFORE the best-weight restore: the
        # average tracks the full trajectory and pairs with the FINAL running
        # BN statistics, not the best epoch's snapshot.
        ema_extra = {}
        if ema_params is not None:
            ema_state = state.replace(params=ema_params)
            ema_val_metrics = engine.run_eval_epoch(ema_state, val_loader)
            if verbose:
                print(f"EMA(decay={ema_decay}) validation IoU: "
                      f"{ema_val_metrics['iou']:.4f}")
            if tb is not None:
                tb.add_scalars({f"ema_val/{k}": v
                                for k, v in ema_val_metrics.items()},
                               step=max(epoch - 1, 0))
            ema_extra = {"ema_state": ema_state,
                         "ema_val_metrics": ema_val_metrics}

        if best_state is not None:
            state = state.replace(params=best_state[0], batch_stats=best_state[1])

        if save_plots and config.get("save_plots", False):
            plot_training_history(train_metrics_history, val_metrics_history,
                                  lr_history, config)

    finally:
        augmenter.cleanup()
        if logger is not None:
            logger.close()
        if tb is not None:
            tb.close()

    return {
        **ema_extra,
        "train_metrics": train_metrics_history,
        "val_metrics": val_metrics_history,
        "lr_history": lr_history,
        "best_iou": best_iou,
        "best_epoch": best_epoch,
        "best_model_state": best_state,
        "state": state,
        "training_time": time_elapsed,
        "final_train_metrics": train_metrics,
        "final_val_metrics": val_metrics,
    }


def _train_model_fused(engine, state, tr_imgs, tr_masks, va_imgs, va_masks,
                       batch_size, num_epochs, lr, scheduler, config,
                       augmenter, verbose):
    """train_model tail using the single-program fused run."""
    from segtpu.train.fused_run import run_training_fused

    seed = int(config.get("seed", 0))
    # replicate the stepwise loop's shuffle-key chain exactly
    keys = []
    k = jax.random.key(seed + 1)
    for _ in range(num_epochs):
        k, sk = jax.random.split(k)
        keys.append(sk)

    sched_params = None
    if scheduler is not None:
        sched_params = dict(factor=scheduler.factor,
                            patience=scheduler.patience,
                            threshold=scheduler.threshold,
                            min_lr=scheduler.min_lr)

    if verbose:
        print("Starting training (fused run)...")
    start_time = time.time()
    out = run_training_fused(
        engine, state, tr_imgs, tr_masks, va_imgs, va_masks,
        batch_size=batch_size, num_epochs=num_epochs, lr0=lr,
        epoch_keys=keys, scheduler_params=sched_params,
        es_patience=config.get("early_stopping_patience", 7),
        es_min_delta=config.get("early_stopping_min_delta", 0.001))
    time_elapsed = time.time() - start_time

    if verbose:
        for e, (tm, vm, l) in enumerate(zip(out["train_history"],
                                            out["val_history"],
                                            out["lr_history"])):
            print(f"Epoch {e+1:3d}/{num_epochs} - "
                  f"Train Loss: {tm['loss']:.4f}, Train IoU: {tm['iou']:.4f}, "
                  f"Val Loss: {vm['loss']:.4f}, Val IoU: {vm['iou']:.4f}, "
                  f"LR: {l:.6f}")
        print(f"Training complete in {time_elapsed // 60:.0f}m "
              f"{time_elapsed % 60:.0f}s")
        print(f"Best validation IoU: {out['best_iou']:.4f} at epoch "
              f"{out['best_epoch']+1}")

    if config.get("metrics_log"):
        from segtpu.core.logging import MetricsLogger
        with MetricsLogger(config["metrics_log"]) as logger:
            for e, (tm, vm, l) in enumerate(zip(out["train_history"],
                                                out["val_history"],
                                                out["lr_history"])):
                logger.log({"epoch": e, "lr": l,
                            **{f"train_{k}": v for k, v in tm.items()},
                            **{f"val_{k}": v for k, v in vm.items()}},
                           kind="epoch")

    if config.get("tensorboard_dir"):
        from segtpu.core.tboard import TBWriter
        with TBWriter(config["tensorboard_dir"]) as tb:
            for e, (tm, vm, l) in enumerate(zip(out["train_history"],
                                                out["val_history"],
                                                out["lr_history"])):
                tb.add_scalars(
                    {"lr": l,
                     **{f"train/{k}": v for k, v in tm.items()},
                     **{f"val/{k}": v for k, v in vm.items()}}, step=e)

    if config.get("save_plots", False):
        plot_training_history(out["train_history"], out["val_history"],
                              out["lr_history"], config)
    augmenter.cleanup()

    best_state = (out["state"].params, out["state"].batch_stats) \
        if out["best_found"] else None
    return {
        "train_metrics": out["train_history"],
        "val_metrics": out["val_history"],
        "lr_history": out["lr_history"],
        "best_iou": out["best_iou"],
        "best_epoch": out["best_epoch"],
        "best_model_state": best_state,
        "state": out["state"],
        "training_time": time_elapsed,
        "final_train_metrics": out["train_history"][-1]
        if out["train_history"] else {},
        "final_val_metrics": out["val_history"][-1]
        if out["val_history"] else {},
    }


def train_epoch(engine: TrainEngine, state: TrainState,
                loader: DeviceDataLoader, lr: float = 1e-3,
                key=None) -> Tuple[TrainState, Dict]:
    """Single-epoch entry point (reference: train_epoch, train.py:17-68)."""
    return engine.run_train_epoch(state, loader, lr, key)


def evaluate(engine: TrainEngine, state: TrainState,
             loader: DeviceDataLoader) -> Dict:
    """Evaluation entry point (reference: evaluate, train.py:71-112)."""
    return engine.run_eval_epoch(state, loader)


def quick_train(model=None, train_images=(), train_masks=(), val_images=(),
                val_masks=(), config: Dict = None, device=None,
                augmentations_per_image: int = 0) -> Dict:
    """One-call training with the standard setup (train.py:301-364):
    loss from config, Adam(lr=1e-3, wd=1e-5), plateau scheduler
    (max, ×0.5, patience=scheduler_patience|3, threshold .01, min_lr 1e-6)."""
    config = dict(config or {})
    lr = config.get("learning_rate", 1e-3)
    scheduler = ReduceLROnPlateau(
        initial_lr=lr, mode="max", factor=0.5,
        patience=config.get("scheduler_patience", 3), threshold=0.01,
        min_lr=1e-6)
    return train_model(
        model=model, train_images=train_images, train_masks=train_masks,
        val_images=val_images, val_masks=val_masks, criterion=None,
        optimizer={"learning_rate": lr,
                   "weight_decay": config.get("weight_decay", 1e-5)},
        scheduler=scheduler, num_epochs=config.get("num_epochs", 50),
        device=device, config=config,
        augmentations_per_image=augmentations_per_image,
        save_plots=config.get("save_plots", True))


def plot_training_history(train_metrics: List[Dict], val_metrics: List[Dict],
                          lr_history: List[float], config: Dict) -> None:
    """Loss/IoU/LR curves (reference: plot_training_history,
    train.py:247-298)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(15, 5))

    plt.subplot(1, 3, 1)
    plt.plot([m["loss"] for m in train_metrics], label="Train", linewidth=2)
    plt.plot([m["loss"] for m in val_metrics], label="Validation", linewidth=2)
    plt.title("Training and Validation Loss")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend()
    plt.grid(True, alpha=0.3)

    plt.subplot(1, 3, 2)
    plt.plot([m["iou"] for m in train_metrics], label="Train", linewidth=2)
    plt.plot([m["iou"] for m in val_metrics], label="Validation", linewidth=2)
    plt.title("Training and Validation IoU")
    plt.xlabel("Epoch")
    plt.ylabel("IoU")
    plt.legend()
    plt.grid(True, alpha=0.3)

    plt.subplot(1, 3, 3)
    plt.plot(lr_history, linewidth=2, color="orange")
    plt.title("Learning Rate Schedule")
    plt.xlabel("Epoch")
    plt.ylabel("Learning Rate")
    plt.yscale("log")
    plt.grid(True, alpha=0.3)

    plt.tight_layout()
    if config.get("save_dir"):
        import os
        os.makedirs(config["save_dir"], exist_ok=True)
        out = f"{config['save_dir']}/training_curves.png"
        plt.savefig(out, dpi=200, bbox_inches="tight")
        print(f"Training plots saved to {out}")
    plt.close(fig)
