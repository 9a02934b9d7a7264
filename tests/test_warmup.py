"""LR schedules beyond the reference's plateau: linear warmup
(``warmup_epochs``, ROADMAP #5 convergence lever) and cosine decay
(``lr_schedule: "cosine"`` — metric-independent, so it pipelines at full
window depth with per-epoch LRs). Ramp/decay correctness in train_model,
no-op at 0, and fold-parallel parity with the sequential path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.train.loop import train_model, _materialize
from segtpu.train.optim import ReduceLROnPlateau


@pytest.fixture(scope="module")
def blob32():
    """Canonical uint8 blob data (N, 32, 32), as train_model expects."""
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


CFG = {"backbone": "resnet34", "use_attention": False, "loss_fn": "combo",
       "img_size": (32, 32), "batch_size": 4, "seed": 3, "verbose": False}


def _run(imgs, masks, num_epochs, **cfg_extra):
    cfg = dict(CFG, **cfg_extra)
    sched = ReduceLROnPlateau(initial_lr=1e-3, mode="max", factor=0.5,
                              patience=1, threshold=0.3, min_lr=1e-6)
    return train_model(
        train_images=imgs[:10], train_masks=masks[:10],
        val_images=imgs[10:], val_masks=masks[10:],
        scheduler=sched, num_epochs=num_epochs, config=cfg,
        save_plots=False)


def test_warmup_lr_ramp(blob32):
    """Epoch e in 1..W runs at lr*e/W; the aggressive plateau scheduler
    (threshold 0.3 rel) must NOT cut during the ramp."""
    imgs, masks = blob32
    out = _run(imgs, masks, num_epochs=6, warmup_epochs=3)
    lrs = out["lr_history"]
    assert lrs[:3] == pytest.approx([1e-3 / 3, 2e-3 / 3, 1e-3])
    # post-warmup LRs come from the scheduler starting at the base LR
    assert all(lr <= 1e-3 + 1e-12 for lr in lrs[3:])
    assert len(out["val_metrics"]) == 6


def test_warmup_zero_is_identity(blob32):
    """warmup_epochs=0 must be bit-identical to the key being absent."""
    imgs, masks = blob32
    a = _run(imgs, masks, num_epochs=5)
    b = _run(imgs, masks, num_epochs=5, warmup_epochs=0)
    assert a["lr_history"] == b["lr_history"]
    assert a["val_metrics"] == b["val_metrics"]
    assert a["train_metrics"] == b["train_metrics"]


def _cosine_expected(num_epochs, warmup, base=1e-3, min_lr=1e-6):
    import math
    span = max(1, num_epochs - warmup)
    out = [base * (e + 1) / warmup for e in range(warmup)]
    out += [min_lr + 0.5 * (base - min_lr)
            * (1 + math.cos(math.pi * (e - warmup) / span))
            for e in range(warmup, num_epochs)]
    return out


def test_cosine_schedule_lr_history(blob32):
    """lr_history must equal the closed-form warmup+cosine schedule; a
    passed plateau scheduler is ignored (pipelined at full depth)."""
    imgs, masks = blob32
    out = _run(imgs, masks, num_epochs=6, warmup_epochs=2,
               lr_schedule="cosine", pipeline_epochs=4)
    assert out["lr_history"] == pytest.approx(_cosine_expected(6, 2))
    assert len(out["val_metrics"]) == 6


def test_cosine_unknown_schedule_raises(blob32):
    imgs, masks = blob32
    with pytest.raises(ValueError, match="lr_schedule"):
        _run(imgs, masks, num_epochs=2, lr_schedule="step")


def test_cosine_fold_parallel_matches_sequential(blob32):
    from segtpu.eval.fold_parallel import train_folds_parallel

    imgs, masks = blob32
    tr = _materialize(imgs[:10], masks[:10])
    va = _materialize(imgs[10:], masks[10:])
    cfg = dict(CFG, num_epochs=6, warmup_epochs=2, lr_schedule="cosine",
               learning_rate=1e-3, weight_decay=1e-5)
    par = train_folds_parallel([(tr[0], tr[1], va[0], va[1])], cfg,
                               seeds=[CFG["seed"]])
    assert par[0]["lr_history"] == pytest.approx(_cosine_expected(6, 2))

    seq = _run(imgs, masks, num_epochs=6, warmup_epochs=2,
               lr_schedule="cosine")
    assert par[0]["lr_history"] == pytest.approx(seq["lr_history"])
    for pm, sm in zip(par[0]["val_metrics"], seq["val_metrics"]):
        assert pm["loss"] == pytest.approx(sm["loss"], abs=5e-3)


def test_warmup_fold_parallel_matches_sequential(blob32):
    """The stream fold-parallel loop replicates train_model's warmup ramp
    (loop.py / fold_parallel.py must stay in lockstep)."""
    from segtpu.eval.fold_parallel import train_folds_parallel

    imgs, masks = blob32
    tr = _materialize(imgs[:10], masks[:10])
    va = _materialize(imgs[10:], masks[10:])
    cfg = dict(CFG, num_epochs=6, warmup_epochs=3, learning_rate=1e-3,
               weight_decay=1e-5, scheduler_patience=1,
               scheduler_threshold=0.3)
    par = train_folds_parallel([(tr[0], tr[1], va[0], va[1])], cfg,
                               seeds=[CFG["seed"]])

    sched = ReduceLROnPlateau(initial_lr=1e-3, mode="max", factor=0.5,
                              patience=1, threshold=0.3, min_lr=1e-6)
    seq = train_model(
        train_images=imgs[:10], train_masks=masks[:10],
        val_images=imgs[10:], val_masks=masks[10:],
        scheduler=sched, num_epochs=6, config=dict(cfg), save_plots=False)

    assert par[0]["lr_history"] == pytest.approx(seq["lr_history"])
    assert len(par[0]["val_metrics"]) == len(seq["val_metrics"])
    for pm, sm in zip(par[0]["val_metrics"], seq["val_metrics"]):
        assert pm["loss"] == pytest.approx(sm["loss"], abs=5e-3)
