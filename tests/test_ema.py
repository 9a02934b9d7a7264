"""Weight EMA (config ``ema_decay``) and the train_model ``tensorboard_dir``
integration. EMA parity is pinned by replicating train_model's exact
engine-call and PRNG-key chain at the test level and Polyak-averaging by
hand; TB events are read back and matched against the returned history."""

import numpy as np
import pytest

import jax

from segtpu.core.tboard import read_scalar_events
from segtpu.data.loader import DeviceDataLoader
from segtpu.train.engine import get_engine
from segtpu.train.loop import _ema_update, _materialize, train_model

CFG = {"backbone": "resnet34", "use_attention": False, "loss_fn": "combo",
       "img_size": (32, 32), "batch_size": 4, "seed": 3, "verbose": False}
N_EPOCHS = 3
DECAY = 0.5


@pytest.fixture(scope="module")
def blob32():
    rng = np.random.default_rng(11)
    n, s = 14, 32
    imgs = rng.normal(0.3, 0.05, (n, s, s)).astype(np.float32)
    masks = np.zeros((n, s, s), np.uint8)
    yy, xx = np.mgrid[0:s, 0:s]
    for i in range(n):
        cy, cx = rng.integers(8, 24, 2)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 36
        imgs[i][blob] += 0.5
        masks[i][blob] = 255
    return np.clip(imgs * 255, 0, 255).astype(np.uint8), masks


@pytest.fixture(scope="module")
def ema_run(blob32, tmp_path_factory):
    imgs, masks = blob32
    tbdir = str(tmp_path_factory.mktemp("tb"))
    out = train_model(
        train_images=imgs[:10], train_masks=masks[:10],
        val_images=imgs[10:], val_masks=masks[10:],
        scheduler=None, num_epochs=N_EPOCHS,
        config=dict(CFG, ema_decay=DECAY, tensorboard_dir=tbdir),
        save_plots=False)
    return out, tbdir


def test_ema_matches_manual_polyak_average(ema_run, blob32):
    """Drive the engine directly with train_model's exact key chain and
    average by hand — the returned ema_state must match bit-for-bit (same
    compiled programs, same dispatch order)."""
    out, _ = ema_run
    imgs, masks = blob32
    engine = get_engine(dict(CFG))
    tr = _materialize(imgs[:10], masks[:10])
    va = _materialize(imgs[10:], masks[10:])
    train_loader = DeviceDataLoader.from_arrays(
        tr[0], tr[1], CFG["batch_size"], shuffle=True, seed=CFG["seed"])
    val_loader = DeviceDataLoader.from_arrays(
        va[0], va[1], CFG["batch_size"], shuffle=False)
    state = engine.init_state(jax.random.key(CFG["seed"]), (1, 32, 32, 1),
                              1e-3, 1e-5)
    ema = state.params
    key = jax.random.key(CFG["seed"] + 1)
    for _ in range(N_EPOCHS):
        key, sk = jax.random.split(key)
        state, _, _ = engine.run_train_and_eval_epoch_async(
            state, train_loader, val_loader, 1e-3, sk)
        ema = _ema_update(ema, state.params, np.float32(DECAY))

    got = out["ema_state"].params
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ema),
            jax.tree_util.tree_leaves_with_path(got)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0,
                                   err_msg=jax.tree_util.keystr(pa))
    # and the average is not just the final weights
    final = state.params
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(ema),
                             jax.tree_util.tree_leaves(final))]
    assert max(diffs) > 0


def test_ema_result_schema(ema_run):
    out, _ = ema_run
    assert set(out["ema_val_metrics"]) == \
        {"precision", "recall", "f1", "iou", "accuracy", "loss"}
    assert np.isfinite(out["ema_val_metrics"]["loss"])
    # best-weight restore must NOT leak into ema_state
    assert out["ema_state"].batch_stats is not None


def test_no_ema_keys_when_disabled(blob32):
    imgs, masks = blob32
    out = train_model(
        train_images=imgs[:10], train_masks=masks[:10],
        val_images=imgs[10:], val_masks=masks[10:],
        scheduler=None, num_epochs=1, config=dict(CFG), save_plots=False)
    assert "ema_state" not in out and "ema_val_metrics" not in out


def test_bad_decay_raises(blob32):
    imgs, masks = blob32
    with pytest.raises(ValueError, match="ema_decay"):
        train_model(
            train_images=imgs[:10], train_masks=masks[:10],
            val_images=imgs[10:], val_masks=masks[10:],
            scheduler=None, num_epochs=1,
            config=dict(CFG, ema_decay=1.0), save_plots=False)


def test_tensorboard_events_match_history(ema_run):
    """One scalar Event per epoch, tags train/* val/* lr, values matching
    the returned history; plus a final ema_val/* record."""
    import glob
    import os
    out, tbdir = ema_run
    files = glob.glob(os.path.join(tbdir, "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(read_scalar_events(files[0]))
    epoch_events = [e for e in events if "val/iou" in e[2]]
    assert [e[1] for e in epoch_events] == list(range(N_EPOCHS))
    for (wt, step, scalars), vm, tm, lr in zip(
            epoch_events, out["val_metrics"], out["train_metrics"],
            out["lr_history"]):
        assert scalars["val/iou"] == pytest.approx(vm["iou"], abs=1e-6)
        assert scalars["train/loss"] == pytest.approx(tm["loss"],
                                                      rel=1e-5)
        assert scalars["lr"] == pytest.approx(lr, rel=1e-6)
    ema_events = [e for e in events if "ema_val/iou" in e[2]]
    assert len(ema_events) == 1
    assert ema_events[0][2]["ema_val/iou"] == pytest.approx(
        out["ema_val_metrics"]["iou"], abs=1e-6)
