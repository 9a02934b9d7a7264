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

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.train.engine import METRIC_KEYS, TrainEngine, TrainState, get_engine
from segtpu.train.optim import EarlyStopping, ReduceLROnPlateau


def shard_folds(states: TrainState, arrays: Sequence[jnp.ndarray], mesh,
                axis: str = "data"):
    """Lay the stacked fold axis out across a device mesh: fold k's weights
    AND data live on device k % ndev, so the vmapped epoch program runs
    K/ndev folds per chip with ZERO collectives — CV folds are
    embarrassingly parallel (SURVEY §2.1 #15), which on a TPU slice means
    fold-parallelism IS the multi-chip strategy for experiment sweeps
    (each fold's batch-4 step is far too small to data-parallelize).

    Requires K % mesh.shape[axis] == 0. Returns (states, arrays) with
    every leaf/array sharded on its leading (fold) axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def lead(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return (jax.tree.map(lead, states), [lead(a) for a in arrays])


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
        auto_bias: bool = True, mesh=None,
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
      that early-stop genuinely stop costing compute. This is the
      single-chip winner: vmapping over per-fold WEIGHTS turns every
      conv into a grouped conv, measured 6.3× one fold's epoch instead
      of ~5× cheaper dispatch (PERF.md round 3). With ``devices`` (a
      list of jax devices) fold k lives on devices[k % ndev] — true
      multi-chip fold parallelism with zero collectives.
    - ``"vmap"``: all K folds stacked on a leading axis, one fused
      program per epoch. ``mesh`` (a `jax.sharding.Mesh`) shards the
      stack across its first axis (K must divide evenly); implies vmap.
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
    if mesh is not None:
        strategy = "vmap"
    if strategy not in ("stream", "vmap"):
        raise ValueError(f"unknown fold-parallel strategy {strategy!r}")

    if engine is None:
        engine = get_engine(config)

    # ---- per-fold fresh init (+ from-scratch fg-prior bias)
    auto_bias = (auto_bias and "final_bias_prior" not in config
                 and getattr(engine.model, "n_classes", 1) == 1)
    per_fold = []
    for k in range(K):
        st = engine.init_state(jax.random.key(seeds[k]), (1, *img_size, 1),
                               lr0, wd)
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
        if mesh is not None:
            axis = mesh.axis_names[0]
            if K % mesh.shape[axis]:
                raise ValueError(
                    f"fold count {K} must divide evenly across mesh axis "
                    f"'{axis}' of size {mesh.shape[axis]}")
            states, (tr_i, tr_m, va_i, va_m) = shard_folds(
                states, (tr_i, tr_m, va_i, va_m), mesh, axis)
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

    t0 = time.time()
    for epoch in range(num_epochs):
        if strategy == "vmap":
            keys = []
            for k in range(K):
                chains[k], sk = jax.random.split(chains[k])
                keys.append(sk)
            states, ttot, vtot = engine.run_fold_epochs(
                states, tr_i, tr_m, va_i, va_m, lrs, jnp.stack(keys),
                batch_size)
            # ONE sync for all folds
            ttot, vtot = jax.device_get((ttot, vtot))
            totals = {k: (ttot[k], vtot[k]) for k in range(K) if active[k]}
        else:
            pending = {}
            for k in range(K):
                if not active[k]:
                    continue
                chains[k], sk = jax.random.split(chains[k])
                states_l[k], tt, vt = engine.run_fold_epoch_async(
                    states_l[k], *arrays[k], lrs[k], sk, batch_size)
                pending[k] = (tt, vt)
            # all K epochs are now enqueued back-to-back; one batched sync
            totals = jax.device_get(pending)

        improved = np.zeros(K, bool)
        for k, (tt, vt) in totals.items():
            nk = n if strategy == "vmap" else ns[k]
            nvk = nv if strategy == "vmap" else nvs[k]
            tm = dict(zip(METRIC_KEYS, map(float, np.asarray(tt) / nk)))
            vm = dict(zip(METRIC_KEYS, map(float, np.asarray(vt) / nvk)))
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
        if strategy == "vmap":
            if improved.any():
                best_pb = _select_best(
                    best_pb, (states.params, states.batch_stats),
                    jnp.asarray(improved))
        else:
            for k in np.nonzero(improved)[0]:
                # arrays are immutable; holding the reference IS the
                # snapshot (same semantics as train_model's best-weights)
                best_pb_l[k] = (states_l[k].params, states_l[k].batch_stats)
        if not active.any():
            break
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
