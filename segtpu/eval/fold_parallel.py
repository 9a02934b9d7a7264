"""Fold-parallel cross-validation training.

TPU-native redesign of the reference's sequential fold loop
(cross_validation.py:77-124): the reference trains K folds one after
another, each a fresh model through `train_model`. The folds are
embarrassingly parallel — same architecture, same shapes, independent
data/weights — so all K trainings advance together, one epoch per
round. Default `stream` strategy: each fold's epoch (shuffle →
scan-train → eval, one jitted program, `TrainEngine.run_fold_epoch_async`)
is an ASYNC dispatch; K folds × an h-epoch pipeline window enqueue
back-to-back on the device queue and the host pays ONE batched metric
fetch per window (~1 s RTT per fetch on a relay-attached TPU, so the
fetch bill is divided by K×h). The window size h is the controllers'
provable no-event horizon (`safe_horizon`, segtpu/train/optim.py), so
pipelining is mis-speculation-free and bit-identical to per-epoch
dispatch. On a multi-chip slice, `devices=[...]` places fold k on device
k%ndev — genuine parallel fold execution with ZERO collectives and no
GSPMD (measured: reference-scale 5-fold CV 27.9 → 4.8 s, PERF.md
round 3).

The alternative `vmap` strategy (one fused epoch program over a stacked
fold axis, `TrainEngine.run_fold_epochs`) is a measured single-chip
NEGATIVE: vmapping over per-fold weights lowers every conv to a grouped
conv (6.3× one fold's epoch), and GSPMD cannot shard the fold axis
because the grouped head conv has Cout=1 < K. Kept for the record.

Semantics match the sequential path exactly, per fold:

- fresh per-fold init seed (`seed + 1000*fold_idx`, cross_validation.py:93
  analog — init variance must show up in the fold std),
- per-fold on-device augmentation with the fold's seed,
- the same shuffle-key chain `train_model` uses (`key(seed+1)`, split per
  epoch), the same permutation math as `DeviceDataLoader.batches`,
- host-side per-fold ReduceLROnPlateau / EarlyStopping / best-weight
  tracking between epochs (train.py:115-244 contract). Under `stream` a
  fold that early-stops stops being dispatched; under `vmap` it keeps
  riding the stack (extra epochs discarded). The loop exits when every
  fold has stopped.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.train.engine import (METRIC_KEYS, TrainEngine, TrainState,
                                 auto_pipeline_window, get_engine,
                                 tree_bytes)
from segtpu.train.optim import EarlyStopping, ReduceLROnPlateau


def _stack_states(states: Sequence[TrainState]) -> TrainState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def _index_state(states: TrainState, k: int) -> TrainState:
    return jax.tree.map(lambda x: x[k], states)


def _fold_bias_prior(state: TrainState, masks: jnp.ndarray) -> TrainState:
    """Per-fold analog of `train_model`'s from-scratch foreground-prior
    final-bias init (segtpu/train/loop.py:64-103): bias = logit(fg ratio)
    of THIS fold's (augmented) training masks. Computed entirely on
    device — a host fetch here costs a relay round-trip per fold."""
    try:
        cf = dict(state.params["conv_final"])
        p = jnp.clip(jnp.mean(masks), 1e-4, 1.0 - 1e-4)
        b = jnp.log(p / (1.0 - p))
        cf["bias"] = jnp.broadcast_to(b, cf["bias"].shape).astype(
            cf["bias"].dtype)
        params = dict(state.params)
        params["conv_final"] = cf
    except (KeyError, TypeError):
        return state
    return state.replace(params=params)


_select_best = jax.jit(
    lambda best, cur, improved: jax.tree.map(
        lambda b, c: jnp.where(
            improved.reshape(improved.shape + (1,) * (c.ndim - 1)), c, b),
        best, cur))


def train_folds_parallel(
        fold_arrays: Sequence[Tuple[jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray, jnp.ndarray]],
        config: Dict, engine: Optional[TrainEngine] = None,
        seeds: Optional[Sequence[int]] = None,
        auto_bias: bool = True,
        strategy: str = "stream",
        devices: Optional[Sequence] = None) -> List[Dict]:
    """Train K independent folds simultaneously; returns one
    `train_model`-schema result dict per fold (train.py:115-244 contract:
    metric histories, lr_history, best_iou/epoch, best_model_state, final
    metrics).

    ``fold_arrays``: per fold, materialized device arrays
    (tr_imgs, tr_masks, va_imgs, va_masks) of IDENTICAL shapes across
    folds (group unequal folds before calling — `cv_train_folds_parallel`
    does). ``seeds``: per-fold init/shuffle seeds (default
    `config.seed + 1000*fold_idx`). ``auto_bias=False`` disables the
    from-scratch fg-prior bias for callers whose sequential path never
    applies it (forward selection trains through the raw engine).

    ``strategy``:
    - ``"stream"`` (default): round-robin ASYNC dispatch — each fold's
      epoch is the plain single-fold program enqueued back-to-back;
      ONE batched host fetch per epoch covers every fold, and folds
      that early-stop genuinely stop costing compute. With ``devices``
      (a list of jax devices) fold k lives on devices[k % ndev] — true
      multi-chip fold parallelism with zero collectives, no GSPMD.
    - ``"vmap"``: all K folds stacked on a leading axis, one fused
      program per epoch. Measured NEGATIVE on one chip (vmapping over
      per-fold WEIGHTS turns every conv into a grouped conv, 6.3× one
      fold's epoch — PERF.md round 3), and GSPMD cannot partition the
      fold axis either (the grouped head conv has Cout=1 < K). Kept as
      a recorded alternative; use stream.
    """
    config = dict(config or {})
    K = len(fold_arrays)
    img_size = tuple(config.get("img_size", (256, 256)))
    batch_size = int(config.get("batch_size", 2))
    num_epochs = int(config.get("num_epochs", 50))
    lr0 = float(config.get("learning_rate", 1e-3))
    wd = float(config.get("weight_decay", 1e-5))
    base_seed = int(config.get("seed", 0))
    if seeds is None:
        seeds = [base_seed + 1000 * k for k in range(K)]
    strategy = config.get("fold_parallel_strategy", strategy)
    if strategy not in ("stream", "vmap"):
        raise ValueError(f"unknown fold-parallel strategy {strategy!r}")

    if engine is None:
        engine = get_engine(config)

    # ---- per-fold fresh init (+ from-scratch fg-prior bias; scoped to
    # the CE-family losses that stall all-background — same gating as
    # train_model's _auto_final_bias, segtpu/train/loop.py)
    from segtpu.train.loop import BCE_FAMILY_LOSSES
    auto_bias = (auto_bias and "final_bias_prior" not in config
                 and getattr(engine.model, "n_classes", 1) == 1
                 and config.get("loss_fn", "combo") in BCE_FAMILY_LOSSES)
    per_fold = []
    from segtpu.models.torch_convert import resolve_encoder_checkpoint
    ckpt = resolve_encoder_checkpoint(config.get("encoder_checkpoint"),
                                      engine.model.backbone)
    for k in range(K):
        if ckpt:
            # pretrained encoder overlay per fold (decoder stays each
            # fold's own seed-derived init) — same semantics as
            # train_model's encoder_checkpoint path (segtpu/train/loop.py)
            from segtpu.models.torch_convert import load_pretrained
            p, bs = load_pretrained(
                engine.model, jax.random.key(seeds[k]), (1, *img_size, 1),
                ckpt, kind=config.get("checkpoint_kind", "torchvision"))
            st = engine.state_from(p, bs, lr0, wd)
        else:
            st = engine.init_state(jax.random.key(seeds[k]),
                                   (1, *img_size, 1), lr0, wd)
            if auto_bias:
                st = _fold_bias_prior(st, fold_arrays[k][1])
        per_fold.append(st)

    if strategy == "vmap":
        states = _stack_states(per_fold)
        del per_fold
        tr_i = jnp.stack([f[0] for f in fold_arrays])
        tr_m = jnp.stack([f[1] for f in fold_arrays])
        va_i = jnp.stack([f[2] for f in fold_arrays])
        va_m = jnp.stack([f[3] for f in fold_arrays])
        n, nv = tr_i.shape[1], va_i.shape[1]
    else:
        states_l = per_fold
        arrays = [tuple(map(jnp.asarray, f)) for f in fold_arrays]
        if devices:
            states_l = [jax.device_put(s, devices[k % len(devices)])
                        for k, s in enumerate(states_l)]
            arrays = [jax.device_put(a, devices[k % len(devices)])
                      for k, a in enumerate(arrays)]
        # stream handles unequal fold sizes natively (one jitted program
        # per distinct size; no stacking constraint)
        ns = [a[0].shape[0] for a in arrays]
        nvs = [a[2].shape[0] for a in arrays]
        best_pb_l: List[Optional[Tuple]] = [None] * K

    # ---- host-side per-fold controllers (identical to the sequential path)
    # scheduler defaults follow CrossValidator.train_single_model
    # (cross_validation.py:104-106): max-mode, ×0.5, patience 3, torch
    # default threshold 1e-4, min_lr 1e-6.
    schedulers = [ReduceLROnPlateau(
        initial_lr=lr0, mode="max", factor=0.5,
        patience=config.get("scheduler_patience", 3),
        threshold=config.get("scheduler_threshold", 1e-4),
        min_lr=1e-6) for _ in range(K)]
    stoppers = [EarlyStopping(
        patience=config.get("early_stopping_patience", 7),
        min_delta=config.get("early_stopping_min_delta", 0.001))
        for _ in range(K)]
    lrs = np.full(K, lr0, np.float64)
    # Linear LR warmup, mirroring train_model (loop.py): epoch e in 1..W
    # runs at lr0·e/W for every fold; schedulers engage after the ramp.
    warmup = int(config.get("warmup_epochs", 0))
    # Cosine LR decay, mirroring train_model: metric-independent, so the
    # stream window pipelines at full depth with per-epoch LRs; the
    # plateau schedulers are bypassed entirely.
    schedule = str(config.get("lr_schedule", "plateau")).lower()
    if schedule not in ("plateau", "cosine"):
        raise ValueError(
            f"Unknown lr_schedule '{schedule}' (plateau|cosine)")
    if schedule == "cosine":
        import math
        _cmin = float(config.get("min_lr", 1e-6))
        _cspan = max(1, num_epochs - warmup)

        def _cos_lr(e: int) -> float:
            return _cmin + 0.5 * (lr0 - _cmin) * (
                1.0 + math.cos(math.pi * (e - warmup) / _cspan))
    active = np.ones(K, bool)
    tr_hist: List[List[Dict]] = [[] for _ in range(K)]
    va_hist: List[List[Dict]] = [[] for _ in range(K)]
    lr_hist: List[List[float]] = [[] for _ in range(K)]
    best_iou = np.zeros(K)
    best_epoch = np.zeros(K, int)
    best_found = np.zeros(K, bool)
    if strategy == "vmap":
        best_pb = (states.params, states.batch_stats)

    # per-fold shuffle chains — train_model seeds its chain at key(seed+1)
    chains = [jax.random.key(s + 1) for s in seeds]

    def controller_step(k: int, epoch: int, tt, vt, nk: int, nvk: int,
                        improved, ran_lr=None) -> None:
        tm = dict(zip(METRIC_KEYS, map(float, np.asarray(tt) / nk)))
        vm = dict(zip(METRIC_KEYS, map(float, np.asarray(vt) / nvk)))
        tr_hist[k].append(tm)
        va_hist[k].append(vm)
        if schedule == "cosine":
            # history records the LR the epoch ran at (loop.py parity)
            lr_hist[k].append(float(ran_lr if ran_lr is not None
                                    else lrs[k]))
        else:
            if epoch + 1 > warmup:
                lrs[k] = schedulers[k].step(vm["iou"])
            lr_hist[k].append(float(lrs[k]))
        if vm["iou"] > best_iou[k]:
            best_iou[k] = vm["iou"]
            best_epoch[k] = epoch
            improved[k] = True
            best_found[k] = True
        if stoppers[k].step(vm["iou"]):
            active[k] = False

    t0 = time.time()
    if strategy == "vmap":
        for epoch in range(num_epochs):
            if epoch < warmup:
                lrs[:] = lr0 * (epoch + 1) / warmup
            elif schedule == "cosine":
                lrs[:] = _cos_lr(epoch)
            keys = []
            for k in range(K):
                chains[k], sk = jax.random.split(chains[k])
                keys.append(sk)
            states, ttot, vtot = engine.run_fold_epochs(
                states, tr_i, tr_m, va_i, va_m, lrs, jnp.stack(keys),
                batch_size)
            # ONE sync for all folds
            ttot, vtot = jax.device_get((ttot, vtot))
            improved = np.zeros(K, bool)
            for k in range(K):
                if active[k]:
                    controller_step(k, epoch, ttot[k], vtot[k], n, nv,
                                    improved)
            if improved.any():
                best_pb = _select_best(
                    best_pb, (states.params, states.batch_stats),
                    jnp.asarray(improved))
            if not active.any():
                break
    else:
        # Windowed epoch pipelining (same mechanism as train_model's loop,
        # segtpu/train/loop.py): the plateau/early-stop patience counters
        # prove a per-fold no-event horizon — the next
        # `scheduler.safe_horizon()` epochs must run at the current LR and
        # a stop can only land on the last `stopper.safe_horizon()`-th
        # dispatch. Dispatching min-over-folds horizon epochs for EVERY
        # active fold back-to-back and fetching all K×h metric totals in
        # ONE device_get divides the relay-RTT fetch bill by another h×,
        # with zero mis-speculation and bit-identical numerics.
        # Window sized to an HBM budget unless pipeline_epochs is set:
        # each in-flight step pins EVERY live fold's params/batch_stats
        # snapshot plus its queued shuffled dataset view (see
        # engine.auto_pipeline_window). Sum over folds, not per fold.
        per_step_bytes = sum(
            tree_bytes(states_l[k].params, states_l[k].batch_stats,
                       arrays[k][0], arrays[k][1])
            for k in range(K))
        pipeline = auto_pipeline_window(config, per_step_bytes)
        epoch = 0
        while epoch < num_epochs and active.any():
            live = np.nonzero(active)[0]
            if epoch < warmup:
                h = 1
                lrs[live] = lr0 * (epoch + 1) / warmup
            elif schedule == "cosine":
                # no scheduler events to predict — full window depth
                h = min([pipeline, num_epochs - epoch]
                        + [stoppers[k].safe_horizon() for k in live])
            else:
                h = min([pipeline, num_epochs - epoch]
                        + [schedulers[k].safe_horizon() for k in live]
                        + [stoppers[k].safe_horizon() for k in live])
            pending = []  # per window step: {fold: (tt, vt)}
            snaps = []    # per window step: {fold: (params, batch_stats)}
            step_lrs = []  # per window step: the LR that step ran at
            for i in range(h):
                if schedule == "cosine" and epoch + i >= warmup:
                    lrs[live] = _cos_lr(epoch + i)
                step_lrs.append(float(lrs[live[0]]))
                pj, sj = {}, {}
                for k in live:
                    chains[k], sk = jax.random.split(chains[k])
                    states_l[k], tt, vt = engine.run_fold_epoch_async(
                        states_l[k], *arrays[k], lrs[k], sk, batch_size)
                    pj[k] = (tt, vt)
                    # arrays are immutable; holding the reference IS the
                    # snapshot (same semantics as train_model)
                    sj[k] = (states_l[k].params, states_l[k].batch_stats)
                pending.append(pj)
                snaps.append(sj)
            # all K×h epochs are enqueued back-to-back; one batched sync
            fetched = jax.device_get(pending)
            for j, (pj, sj) in enumerate(zip(fetched, snaps)):
                improved = np.zeros(K, bool)
                for k, (tt, vt) in pj.items():
                    if not active[k]:   # stopped earlier in this window
                        continue        # (unreachable by the horizon bound)
                    controller_step(k, epoch, tt, vt, ns[k], nvs[k],
                                    improved, ran_lr=step_lrs[j])
                for k in np.nonzero(improved)[0]:
                    best_pb_l[k] = sj[k]
                epoch += 1
    elapsed = time.time() - t0

    results = []
    for k in range(K):
        if strategy == "vmap":
            bp = jax.tree.map(lambda x: x[k], best_pb) \
                if best_found[k] else None
            st = _index_state(states, k)
        else:
            bp = best_pb_l[k] if best_found[k] else None
            st = states_l[k]
        if bp is not None:
            st = st.replace(params=bp[0], batch_stats=bp[1])
        results.append({
            "train_metrics": tr_hist[k],
            "val_metrics": va_hist[k],
            "lr_history": lr_hist[k],
            "best_iou": float(best_iou[k]),
            "best_epoch": int(best_epoch[k]),
            "best_model_state": bp,
            "state": st,
            "training_time": elapsed / K,  # amortized over the stack
            "final_train_metrics": tr_hist[k][-1] if tr_hist[k] else {},
            "final_val_metrics": va_hist[k][-1] if va_hist[k] else {},
        })
    return results


def cv_train_folds_parallel(canonical_imgs: np.ndarray,
                            canonical_masks: np.ndarray,
                            cv_folds: Sequence[Tuple[Sequence[int],
                                                     Sequence[int]]],
                            config: Dict,
                            augmentations_per_image: int = 0,
                            engine: Optional[TrainEngine] = None,
                            fold_ids: Optional[Sequence[int]] = None
                            ) -> List[Dict]:
    """CV over pre-resized canonical uint8 data with folds trained in
    parallel. Handles the augment→materialize pipeline per fold (the
    `train_model` front half, loop.py:141-155). Under the default
    ``stream`` strategy all folds advance in one run regardless of size;
    under ``vmap`` (config key ``fold_parallel_strategy``) folds of equal
    train/val sizes are grouped into stacked runs — standard K-fold
    produces at most two such groups when N % K != 0.

    ``fold_ids``: the folds' ORIGINAL indices (seed derivation) when
    ``cv_folds`` is a subset of a larger fold list (resume skips).

    Returns `train_model`-schema result dicts in fold order."""
    from segtpu.data.augment import CellAugmenter
    from segtpu.train.loop import _materialize

    config = dict(config or {})
    base_seed = int(config.get("seed", 0))
    if fold_ids is None:
        fold_ids_seq = list(range(len(cv_folds)))
    else:
        fold_ids_seq = list(fold_ids)
    groups: Dict[Tuple[int, int], List[int]] = {}
    prepared = []
    n_classes = int(config.get("n_classes", 1))
    for k, (tr_idx, va_idx) in enumerate(cv_folds):
        seed = base_seed + 1000 * fold_ids_seq[k]
        ci, cm = (canonical_imgs[list(tr_idx)], canonical_masks[list(tr_idx)])
        if augmentations_per_image > 0:
            # n_classes > 1: label-safe augmentation (integer class labels
            # survive nearest sampling) — same as train_model's front half
            aug = CellAugmenter(augmentations_per_image, seed=seed,
                                n_classes=n_classes)
            ci, cm = aug.augment_training_data(ci, cm)
        tr = _materialize(ci, cm, n_classes)
        va = _materialize(canonical_imgs[list(va_idx)],
                          canonical_masks[list(va_idx)], n_classes)
        prepared.append((tr[0], tr[1], va[0], va[1], seed))
        groups.setdefault((tr[0].shape[0], va[0].shape[0]), []).append(k)

    if config.get("fold_parallel_strategy", "stream") == "stream":
        groups = {None: list(range(len(cv_folds)))}

    results: List[Optional[Dict]] = [None] * len(cv_folds)
    for group in groups.values():
        arrays = [prepared[k][:4] for k in group]
        seeds = [prepared[k][4] for k in group]
        out = train_folds_parallel(arrays, config, engine=engine, seeds=seeds)
        for k, res in zip(group, out):
            results[k] = res
    return results
