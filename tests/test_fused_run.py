"""Whole-run fusion equivalence: the single-program training run must
reproduce the stepwise loop's history exactly (same keys, same scheduler /
early-stopping semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.data.loader import DeviceDataLoader
from segtpu.train.engine import get_engine
from segtpu.train.fused_run import run_training_fused
from segtpu.train.optim import EarlyStopping, ReduceLROnPlateau


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    n, s = 14, 32
    imgs = rng.normal(0.3, 0.05, (n, s, s, 1)).astype(np.float32)
    masks = np.zeros((n, s, s, 1), np.float32)
    yy, xx = np.mgrid[0:s, 0:s]
    for i in range(n):
        cy, cx = rng.integers(8, 24, 2)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 36
        imgs[i, blob, 0] += 0.5
        masks[i, blob, 0] = 1.0
    return (jnp.asarray(imgs[:10]), jnp.asarray(masks[:10]),
            jnp.asarray(imgs[10:]), jnp.asarray(masks[10:]))


def _loop_reference(engine, state, tr_i, tr_m, va_i, va_m, b, epochs, lr0,
                    keys, sched, es):
    """The stepwise loop (train_model's inner semantics)."""
    train_loader = DeviceDataLoader.from_arrays(tr_i, tr_m, b, shuffle=True)
    val_loader = DeviceDataLoader.from_arrays(va_i, va_m, b, shuffle=False)
    lr = lr0
    th, vh, lh = [], [], []
    best_iou, best, best_epoch = 0.0, None, 0
    for e in range(epochs):
        state, tm, vm = engine.run_train_and_eval_epoch(
            state, train_loader, val_loader, lr, keys[e])
        th.append(tm)
        vh.append(vm)
        if sched is not None:
            lr = sched.step(vm["iou"])
        lh.append(lr)
        if vm["iou"] > best_iou:
            best_iou, best, best_epoch = vm["iou"], (state.params,
                                                     state.batch_stats), e
        if es.step(vm["iou"]):
            break
    return dict(train_history=th, val_history=vh, lr_history=lh,
                best_iou=best_iou, best_epoch=best_epoch,
                epochs_ran=len(th), state=state, best=best)


def test_fused_matches_stepwise_loop(problem):
    tr_i, tr_m, va_i, va_m = problem
    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "combo"})
    epochs, b, lr0 = 7, 4, 1e-3
    keys = []
    k = jax.random.key(11)
    for _ in range(epochs + 10):
        k, sk = jax.random.split(k)
        keys.append(sk)
    keys = jnp.asarray(keys)

    sched_params = dict(factor=0.5, patience=2, threshold=0.01, min_lr=1e-6)

    s0 = engine.init_state(jax.random.key(0), (1, 32, 32, 1), lr0, 1e-5)
    ref = _loop_reference(
        engine, s0, tr_i, tr_m, va_i, va_m, b, epochs, lr0, keys,
        ReduceLROnPlateau(lr0, "max", **sched_params),
        EarlyStopping(patience=3, min_delta=0.001))

    s0b = engine.init_state(jax.random.key(0), (1, 32, 32, 1), lr0, 1e-5)
    fused = run_training_fused(
        engine, s0b, tr_i, tr_m, va_i, va_m, batch_size=b,
        num_epochs=epochs, lr0=lr0, epoch_keys=keys,
        scheduler_params=sched_params, es_patience=3, es_min_delta=0.001)

    # Tolerance note: the fused run compiles as one program, the loop as
    # several — different fusion choices give tiny fp32 differences that
    # Adam amplifies over epochs (same effect as the DP-equivalence test).
    # Semantic decisions (epoch counts, LR schedule, best epoch) must match
    # exactly; metric values within growing-but-small tolerance.
    assert fused["epochs_ran"] == ref["epochs_ran"]
    for e in range(ref["epochs_ran"]):
        tol = 2e-4 * (1 + 30 * e)
        for k_ in ("loss", "iou", "f1"):
            assert abs(fused["train_history"][e][k_]
                       - ref["train_history"][e][k_]) < tol, (e, k_)
            assert abs(fused["val_history"][e][k_]
                       - ref["val_history"][e][k_]) < tol, (e, k_)
        assert abs(fused["lr_history"][e] - ref["lr_history"][e]) < 1e-9, e
    assert abs(fused["best_iou"] - ref["best_iou"]) < 2e-2
    assert fused["best_epoch"] == ref["best_epoch"]


def test_fused_early_stop_masks_trailing_epochs(problem):
    tr_i, tr_m, va_i, va_m = problem
    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "combo"})
    keys = jax.random.split(jax.random.key(5), 30)
    s0 = engine.init_state(jax.random.key(1), (1, 32, 32, 1), 1e-3, 1e-5)
    out = run_training_fused(
        engine, s0, tr_i, tr_m, va_i, va_m, batch_size=4, num_epochs=30,
        lr0=1e-3, epoch_keys=keys, scheduler_params=None,
        es_patience=1, es_min_delta=0.9)  # impossible bar → stop at epoch 2
    assert out["epochs_ran"] == 2
    assert len(out["train_history"]) == 2
