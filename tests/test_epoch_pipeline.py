"""Epoch pipelining (windowed dispatch by controller no-event horizon).

train_model (segtpu/train/loop.py) and the fold-parallel stream loop
(segtpu/eval/fold_parallel.py) dispatch windows of epochs before fetching
their metrics, sized by `ReduceLROnPlateau.safe_horizon()` /
`EarlyStopping.safe_horizon()` so that no dispatched epoch can ever use a
stale LR or run past an early stop. These tests pin (1) the horizon
property itself, brute-force over random metric sequences, and (2) bit-
identical training results between pipelined and per-epoch execution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.train.optim import EarlyStopping, ReduceLROnPlateau


def _simulate(metrics, sched_kw, es_kw, pipeline):
    """Run the windowed controller protocol over a fixed metric sequence;
    return (lr_used_per_epoch, lr_after_step_per_epoch, n_epochs_run,
    wasted_dispatches)."""
    sched = ReduceLROnPlateau(initial_lr=1e-3, mode="max", **sched_kw)
    stop = EarlyStopping(**es_kw)
    lr = sched.lr
    used, after = [], []
    e = 0
    wasted = 0
    while e < len(metrics):
        h = min(pipeline, len(metrics) - e,
                sched.safe_horizon(), stop.safe_horizon())
        window = list(range(e, e + h))   # dispatched with current lr
        window_lr = lr
        stopped_at = None
        for j, ei in enumerate(window):
            used.append(window_lr)       # the LR the dispatch actually used
            lr = sched.step(metrics[ei])
            after.append(lr)
            if stop.step(metrics[ei]):
                stopped_at = j
                break
        if stopped_at is not None:
            wasted += len(window) - stopped_at - 1
            e += stopped_at + 1
            break
        e += h
    return used, after, e, wasted


def _simulate_sequential(metrics, sched_kw, es_kw):
    sched = ReduceLROnPlateau(initial_lr=1e-3, mode="max", **sched_kw)
    stop = EarlyStopping(**es_kw)
    lr = sched.lr
    used, after = [], []
    e = 0
    while e < len(metrics):
        used.append(lr)
        lr = sched.step(metrics[e])
        after.append(lr)
        e += 1
        if stop.step(metrics[e - 1]):
            break
    return used, after, e


@pytest.mark.parametrize("pipeline", [2, 4, 8, 64])
def test_horizon_never_mispredicts(pipeline):
    """Brute force: over random metric sequences and controller configs,
    windowed dispatch (a) uses exactly the LR the sequential loop would
    have used at every epoch, (b) stops at exactly the same epoch, and
    (c) never wastes a dispatched epoch."""
    rng = np.random.default_rng(pipeline)
    for trial in range(400):
        sched_kw = dict(factor=0.5,
                        patience=int(rng.integers(1, 5)),
                        threshold=float(rng.choice([1e-4, 0.01])),
                        min_lr=1e-6)
        es_kw = dict(patience=int(rng.integers(1, 8)),
                     min_delta=float(rng.choice([0.0, 0.001, 0.01])))
        n = int(rng.integers(1, 40))
        # random walk with plateaus — exercises both counters
        metrics = np.clip(np.cumsum(rng.normal(0.0, 0.05, n))
                          + rng.choice([0.0, 0.4]), 0, 1)
        if rng.random() < 0.3:
            metrics[n // 2:] = metrics[n // 2]  # hard plateau tail
        metrics = list(map(float, metrics))

        su, sa, se = _simulate_sequential(metrics, sched_kw, es_kw)
        pu, pa, pe, wasted = _simulate(metrics, sched_kw, es_kw, pipeline)
        assert pe == se, (trial, sched_kw, es_kw, metrics)
        assert pu == su, (trial, "lr used diverged")
        assert pa == sa, (trial, "lr after step diverged")
        assert wasted == 0, (trial, "horizon wasted dispatches")


def test_safe_horizon_floors():
    s = ReduceLROnPlateau(initial_lr=1e-3, patience=3)
    assert s.safe_horizon() == 4
    s.num_bad_epochs = 3
    assert s.safe_horizon() == 1
    s.lr = s.min_lr = 1e-6
    assert s.safe_horizon() > 10**6   # at the floor: LR can never change

    es = EarlyStopping(patience=7)
    assert es.safe_horizon() == 7
    es.counter = 6
    assert es.safe_horizon() == 1


@pytest.fixture(scope="module")
def blob_data():
    rng = np.random.default_rng(7)
    n, s = 14, 32
    imgs = rng.normal(0.3, 0.05, (n, s, s)).astype(np.float32)
    masks = np.zeros((n, s, s), np.uint8)
    for i in range(n):
        cy, cx = rng.integers(8, 24, 2)
        yy, xx = np.mgrid[0:s, 0:s]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 36
        imgs[i][blob] += 0.5
        masks[i][blob] = 255
    imgs_u8 = np.clip(imgs * 255, 0, 255).astype(np.uint8)
    return imgs_u8, masks


def test_train_model_pipelined_matches_per_epoch(blob_data):
    """pipeline_epochs=4 must produce BIT-IDENTICAL training to
    pipeline_epochs=1 (same jitted programs, same inputs, same key chain —
    the window only changes when metrics are fetched). The config forces
    plateau LR cuts and early stopping inside the run so the horizon logic
    is exercised, not just the happy path."""
    from segtpu.train.loop import train_model

    imgs, masks = blob_data
    base_cfg = {"backbone": "resnet34", "use_attention": False,
                "loss_fn": "combo", "img_size": (32, 32), "batch_size": 4,
                "seed": 3, "verbose": False, "scheduler_patience": 1,
                "early_stopping_patience": 3,
                "early_stopping_min_delta": 0.05}
    # threshold 0.3 (relative): an epoch only counts as "good" on a 30%
    # relative IoU gain, so plateau cuts are guaranteed within the run
    # whatever the training trajectory — the comparison must exercise a
    # real mid-run LR event, not just the happy path.
    sched = lambda: ReduceLROnPlateau(initial_lr=1e-3, mode="max",
                                      factor=0.5, patience=1,
                                      threshold=0.3, min_lr=1e-6)
    runs = []
    for pipeline in (1, 4):
        cfg = dict(base_cfg, pipeline_epochs=pipeline)
        runs.append(train_model(
            train_images=imgs[:10], train_masks=masks[:10],
            val_images=imgs[10:], val_masks=masks[10:],
            scheduler=sched(), num_epochs=14, config=cfg,
            save_plots=False))
    a, b = runs
    assert len(a["val_metrics"]) == len(b["val_metrics"])
    for ma, mb in zip(a["val_metrics"], b["val_metrics"]):
        assert ma == mb          # bit-identical epoch metrics
    for ma, mb in zip(a["train_metrics"], b["train_metrics"]):
        assert ma == mb
    assert a["lr_history"] == b["lr_history"]
    assert a["best_epoch"] == b["best_epoch"]
    assert a["best_iou"] == b["best_iou"]
    # the run must actually have hit an LR cut to make this a real test
    assert len(set(a["lr_history"])) > 1, a["lr_history"]


def test_fold_parallel_pipelined_matches_per_epoch(blob_data):
    """Stream fold-parallel with the windowed dispatch (pipeline_epochs=4)
    equals per-epoch dispatch (pipeline_epochs=1) bit-for-bit."""
    from segtpu.train.loop import _materialize
    from segtpu.eval.fold_parallel import train_folds_parallel

    imgs, masks = blob_data
    tr = _materialize(imgs[:8], masks[:8])
    va = _materialize(imgs[8:12], masks[8:12])
    arrays = [(tr[0], tr[1], va[0], va[1]),
              (tr[0][::-1], tr[1][::-1], va[0], va[1])]
    base_cfg = {"backbone": "resnet34", "use_attention": False,
                "loss_fn": "combo", "img_size": (32, 32), "batch_size": 4,
                "num_epochs": 10, "seed": 0, "scheduler_patience": 1,
                "early_stopping_patience": 3,
                "early_stopping_min_delta": 0.05}
    outs = []
    for pipeline in (1, 4):
        cfg = dict(base_cfg, pipeline_epochs=pipeline)
        outs.append(train_folds_parallel(arrays, cfg, seeds=[0, 1000]))
    a, b = outs
    for fa, fb in zip(a, b):
        assert fa["val_metrics"] == fb["val_metrics"]
        assert fa["train_metrics"] == fb["train_metrics"]
        assert fa["lr_history"] == fb["lr_history"]
        assert fa["best_epoch"] == fb["best_epoch"]
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(fa["state"].params)[0]),
            np.asarray(jax.tree.leaves(fb["state"].params)[0]))
