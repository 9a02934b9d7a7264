"""Fold-parallel cross-validation training.

TPU-native redesign of the reference's sequential fold loop
(cross_validation.py:77-124): the reference trains K folds one after
another, each a fresh model through `train_model`. The folds are
embarrassingly parallel — same architecture, same shapes, independent
data/weights — which on TPU means they can be STACKED on a leading fold
axis and advanced together: one `jax.vmap`-lifted epoch program
(`TrainEngine.run_fold_epochs`) moves all K trainings forward per device
dispatch. At the reference's scales (batch 2-4, 128² images) a single
fold's step is far below the MXU/dispatch crossover, so K folds cost
roughly one fold's wall time.

Semantics match the sequential path exactly, per fold:

- fresh per-fold init seed (`seed + 1000*fold_idx`, cross_validation.py:93
  analog — init variance must show up in the fold std),
- per-fold on-device augmentation with the fold's seed,
- the same shuffle-key chain `train_model` uses (`key(seed+1)`, split per
  epoch), the same permutation math as `DeviceDataLoader.batches`,
- host-side per-fold ReduceLROnPlateau / EarlyStopping / best-weight
  tracking between epochs (train.py:115-244 contract). A fold that stops
  early keeps riding the stacked program (its extra epochs are discarded);
  the loop exits when every fold has stopped.

One host↔device sync per epoch fetches the (K, 6) train/val metric
totals for ALL folds — on a relay-attached TPU (~1 s RTT per fetch) the
fold-parallel sweep also divides the per-epoch host overhead by K.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.train.engine import METRIC_KEYS, TrainEngine, TrainState, get_engine
from segtpu.train.optim import EarlyStopping, ReduceLROnPlateau


def _stack_states(states: Sequence[TrainState]) -> TrainState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def _index_state(states: TrainState, k: int) -> TrainState:
    return jax.tree.map(lambda x: x[k], states)


def _fold_bias_prior(state: TrainState, masks: jnp.ndarray) -> TrainState:
    """Per-fold analog of `train_model`'s from-scratch foreground-prior
    final-bias init (segtpu/train/loop.py:64-103): bias = logit(fg ratio)
    of THIS fold's (augmented) training masks."""
    p = float(np.clip(float(jnp.mean(masks)), 1e-4, 1.0 - 1e-4))
    b = math.log(p / (1.0 - p))
    try:
        cf = dict(state.params["conv_final"])
        cf["bias"] = jnp.full_like(cf["bias"], b)
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
        auto_bias: bool = True) -> List[Dict]:
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
    applies it (forward selection trains through the raw engine)."""
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

    if engine is None:
        engine = get_engine(config)

    # ---- per-fold fresh init (+ from-scratch fg-prior bias), then stack
    auto_bias = (auto_bias and "final_bias_prior" not in config
                 and getattr(engine.model, "n_classes", 1) == 1)
    per_fold = []
    for k in range(K):
        st = engine.init_state(jax.random.key(seeds[k]), (1, *img_size, 1),
                               lr0, wd)
        if auto_bias:
            st = _fold_bias_prior(st, fold_arrays[k][1])
        per_fold.append(st)
    states = _stack_states(per_fold)
    del per_fold

    tr_i = jnp.stack([f[0] for f in fold_arrays])
    tr_m = jnp.stack([f[1] for f in fold_arrays])
    va_i = jnp.stack([f[2] for f in fold_arrays])
    va_m = jnp.stack([f[3] for f in fold_arrays])
    n, nv = tr_i.shape[1], va_i.shape[1]

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
    active = np.ones(K, bool)
    tr_hist: List[List[Dict]] = [[] for _ in range(K)]
    va_hist: List[List[Dict]] = [[] for _ in range(K)]
    lr_hist: List[List[float]] = [[] for _ in range(K)]
    best_iou = np.zeros(K)
    best_epoch = np.zeros(K, int)
    best_found = np.zeros(K, bool)
    best_pb = (states.params, states.batch_stats)

    # per-fold shuffle chains — train_model seeds its chain at key(seed+1)
    chains = [jax.random.key(s + 1) for s in seeds]

    t0 = time.time()
    for epoch in range(num_epochs):
        keys = []
        for k in range(K):
            chains[k], sk = jax.random.split(chains[k])
            keys.append(sk)
        states, ttot, vtot = engine.run_fold_epochs(
            states, tr_i, tr_m, va_i, va_m, lrs, jnp.stack(keys), batch_size)
        ttot, vtot = jax.device_get((ttot, vtot))  # ONE sync for all folds

        improved = np.zeros(K, bool)
        for k in range(K):
            if not active[k]:
                continue
            tm = dict(zip(METRIC_KEYS, map(float, ttot[k] / n)))
            vm = dict(zip(METRIC_KEYS, map(float, vtot[k] / nv)))
            tr_hist[k].append(tm)
            va_hist[k].append(vm)
            lrs[k] = schedulers[k].step(vm["iou"])
            lr_hist[k].append(float(lrs[k]))
            if vm["iou"] > best_iou[k]:
                best_iou[k] = vm["iou"]
                best_epoch[k] = epoch
                improved[k] = True
                best_found[k] = True
            if stoppers[k].step(vm["iou"]):
                active[k] = False
        if improved.any():
            best_pb = _select_best(
                best_pb, (states.params, states.batch_stats),
                jnp.asarray(improved))
        if not active.any():
            break
    elapsed = time.time() - t0

    results = []
    for k in range(K):
        bp = jax.tree.map(lambda x: x[k], best_pb) if best_found[k] else None
        st = _index_state(states, k)
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
    `train_model` front half, loop.py:141-155) and groups folds of equal
    train/val sizes into stacked runs — standard K-fold produces at most
    two such groups when N % K != 0 (folds.py kfold_split split sizes).

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
    for k, (tr_idx, va_idx) in enumerate(cv_folds):
        seed = base_seed + 1000 * fold_ids_seq[k]
        ci, cm = (canonical_imgs[list(tr_idx)], canonical_masks[list(tr_idx)])
        if augmentations_per_image > 0:
            aug = CellAugmenter(augmentations_per_image, seed=seed)
            ci, cm = aug.augment_training_data(ci, cm)
        tr = _materialize(ci, cm)
        va = _materialize(canonical_imgs[list(va_idx)],
                          canonical_masks[list(va_idx)])
        prepared.append((tr[0], tr[1], va[0], va[1], seed))
        groups.setdefault((tr[0].shape[0], va[0].shape[0]), []).append(k)

    results: List[Optional[Dict]] = [None] * len(cv_folds)
    for fold_ids in groups.values():
        arrays = [prepared[k][:4] for k in fold_ids]
        seeds = [prepared[k][4] for k in fold_ids]
        out = train_folds_parallel(arrays, config, engine=engine, seeds=seeds)
        for k, res in zip(fold_ids, out):
            results[k] = res
    return results
