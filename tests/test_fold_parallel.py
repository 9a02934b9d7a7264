"""Fold-parallel CV tests: the vmapped stacked-fold training must
reproduce the sequential per-fold `train_model` trajectories (same seeds,
same shuffle chains, same plateau/early-stop decisions), handle unequal
K-fold size groups, and plug into CrossValidator end-to-end."""

import numpy as np
import pytest

from segtpu.eval.fold_parallel import (cv_train_folds_parallel,
                                       train_folds_parallel)
from segtpu.eval.folds import kfold_split
from segtpu.train.loop import train_model
from segtpu.train.optim import ReduceLROnPlateau

CFG = {
    "backbone": "resnet34",
    "use_attention": False,
    "batch_size": 4,
    "img_size": (32, 32),
    "learning_rate": 1e-3,
    "weight_decay": 1e-5,
    "loss_fn": "bce",
    "verbose": False,
    "save_plots": False,
    "seed": 0,
}


@pytest.fixture(scope="module")
def canonical():
    """Learnable canonical uint8 blob data (N, 32, 32)."""
    rng = np.random.default_rng(7)
    n, s = 12, 32
    imgs = np.clip(rng.normal(80, 12, (n, s, s)), 0, 255).astype(np.uint8)
    masks = np.zeros((n, s, s), np.uint8)
    yy, xx = np.mgrid[0:s, 0:s]
    for i in range(n):
        cy, cx = rng.integers(8, 24, 2)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 36
        imgs[i][blob] = np.minimum(imgs[i][blob] + 120, 255)
        masks[i][blob] = 255
    return imgs, masks


def test_fold_parallel_matches_sequential(canonical):
    """Two stacked folds == two sequential train_model runs, epoch by
    epoch (cross_validation.py:77-124 protocol; fp-tight, not bitwise —
    vmap changes XLA fusion)."""
    ci, cm = canonical
    folds = [(list(range(0, 8)), list(range(8, 12))),
             (list(range(4, 12)), list(range(0, 4)))]
    cfg = dict(CFG, num_epochs=3)

    par = cv_train_folds_parallel(ci, cm, folds, cfg,
                                  augmentations_per_image=0)

    for k, (tr, va) in enumerate(folds):
        seq_cfg = dict(cfg)
        seq_cfg["seed"] = cfg["seed"] + 1000 * k
        sched = ReduceLROnPlateau(initial_lr=cfg["learning_rate"],
                                  mode="max", factor=0.5, patience=3,
                                  min_lr=1e-6)
        seq = train_model(
            train_images=ci[tr], train_masks=cm[tr],
            val_images=ci[va], val_masks=cm[va],
            optimizer={"learning_rate": cfg["learning_rate"],
                       "weight_decay": cfg["weight_decay"]},
            scheduler=sched, num_epochs=cfg["num_epochs"], config=seq_cfg,
            save_plots=False)

        assert len(par[k]["val_metrics"]) == len(seq["val_metrics"])
        for e, (pm, sm) in enumerate(zip(par[k]["val_metrics"],
                                         seq["val_metrics"])):
            # loss is smooth → tight; iou/f1 threshold at 0.5, which
            # amplifies compounding fusion drift (measured ~1% after a
            # few epochs on identical trajectories) → looser.
            assert abs(pm["loss"] - sm["loss"]) < 5e-3, (k, e, pm, sm)
            for key in ("iou", "f1"):
                assert abs(pm[key] - sm[key]) < 2e-2, (k, e, key, pm, sm)
        for e, (pm, sm) in enumerate(zip(par[k]["train_metrics"],
                                         seq["train_metrics"])):
            assert abs(pm["loss"] - sm["loss"]) < 5e-3, (k, e, pm, sm)
        assert par[k]["lr_history"] == pytest.approx(seq["lr_history"])
        assert par[k]["best_epoch"] == seq["best_epoch"]
        assert par[k]["best_iou"] == pytest.approx(seq["best_iou"],
                                                   abs=2e-2)


def test_unequal_fold_grouping(canonical):
    """kfold_split(12, 3) is equal-sized, so force unequal folds from 10
    samples: two (7 train, 3 val) + one (6 train, 4 val) group — under
    the vmap strategy these stack per size group; results must come back
    in fold order with full schema."""
    ci, cm = canonical
    folds = list(kfold_split(10, 3, shuffle=True, random_state=1))
    sizes = {(len(tr), len(va)) for tr, va in folds}
    assert len(sizes) == 2  # two stacked groups exercised
    res = cv_train_folds_parallel(ci[:10], cm[:10], folds,
                                  dict(CFG, num_epochs=1,
                                       fold_parallel_strategy="vmap"),
                                  augmentations_per_image=0)
    assert len(res) == 3
    for r, (tr, va) in zip(res, folds):
        assert set(r["final_val_metrics"]) == {"precision", "recall", "f1",
                                               "iou", "accuracy", "loss"}
        assert len(r["val_metrics"]) == 1
        assert r["best_iou"] == pytest.approx(
            max(m["iou"] for m in r["val_metrics"]))


def test_early_stop_per_fold(canonical):
    """A fold hitting early stop freezes its history while the stack keeps
    training the others (train.py:207-232 per-fold semantics)."""
    ci, cm = canonical
    folds = [(list(range(0, 8)), list(range(8, 12))),
             (list(range(4, 12)), list(range(0, 4)))]
    cfg = dict(CFG, num_epochs=4, early_stopping_patience=1,
               early_stopping_min_delta=0.5)  # impossible bar: stop at 2
    res = cv_train_folds_parallel(ci, cm, folds, cfg,
                                  augmentations_per_image=0)
    for r in res:
        assert len(r["val_metrics"]) == 2  # epoch0 best-init, epoch1 stop
        assert r["final_val_metrics"] == r["val_metrics"][-1]


def test_multi_device_folds_match_single_device(canonical):
    """Folds placed across 2 devices (stream strategy, fold k on device
    k) produce the same training results as the single-device run: fold
    parallelism over chips needs zero collectives, so the placement must
    be semantically invisible."""
    import jax
    from segtpu.train.loop import _materialize

    ci, cm = canonical
    folds = [(list(range(0, 8)), list(range(8, 12))),
             (list(range(4, 12)), list(range(0, 4)))]
    cfg = dict(CFG, num_epochs=2)
    arrays = []
    for tr, va in folds:
        t = _materialize(ci[tr], cm[tr])
        v = _materialize(ci[va], cm[va])
        arrays.append((t[0], t[1], v[0], v[1]))

    base = train_folds_parallel(arrays, cfg, seeds=[0, 1000])
    placed = train_folds_parallel(arrays, cfg, seeds=[0, 1000],
                                  devices=jax.devices()[:2])
    assert {d.id for d in jax.tree.leaves(placed[1]["state"].params)[0]
            .devices()} == {1}  # fold 1 really lives on device 1

    for b, s in zip(base, placed):
        for e, (bm, sm) in enumerate(zip(b["val_metrics"],
                                         s["val_metrics"])):
            assert bm["loss"] == pytest.approx(sm["loss"], abs=2e-3), e
            assert bm["iou"] == pytest.approx(sm["iou"], abs=1e-2), e
        assert b["lr_history"] == pytest.approx(s["lr_history"])

    with pytest.raises(ValueError, match="strategy"):
        train_folds_parallel(arrays, cfg, seeds=[0, 1000],
                             strategy="bogus")


def test_forward_selection_fold_parallel(tmp_path, monkeypatch):
    """Forward selection with fold_parallel=True completes the greedy
    search on the fixture and writes the same result schema (the parallel
    path differs from sequential only in the shuffle-key stream)."""
    from segtpu.data.io import make_synthetic_dataset
    from segtpu.experiments import forward_selection as fs

    data_dir = make_synthetic_dataset(str(tmp_path), n_images=8,
                                      image_type="W")
    monkeypatch.setattr(
        fs, "AUGMENTATION_CANDIDATES",
        {k: v for k, v in fs.AUGMENTATION_CANDIDATES.items()
         if k in ("horizontal_flip",)})
    results, pipeline = fs.run_augmentation_selection_experiment(
        data_dir=data_dir,
        config_overrides={"backbone": "resnet34", "use_attention": False,
                          "batch_size": 4, "img_size": (32, 32),
                          "num_epochs": 1, "image_type": "W",
                          "loss_fn": "focal", "fold_parallel": True},
        max_augmentations=1, cv_folds=2, quick_evaluation=True,
        save_root=str(tmp_path))
    assert "selected_augmentations" in results
    assert results["baseline_score"] >= 0.0
    assert callable(pipeline)


def test_cv_fold_parallel_preserves_multiclass_labels(monkeypatch):
    """Regression (round-5 review): cv_train_folds_parallel must thread
    n_classes into _materialize/CellAugmenter — integer class labels may
    NOT silently binarize to {0,1}."""
    import segtpu.eval.fold_parallel as fp

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (6, 32, 32), np.uint8)
    masks = np.zeros((6, 32, 32), np.uint8)
    masks[:, 4:12, 4:12] = 1
    masks[:, 18:28, 18:28] = 2  # the label that binarization destroys

    captured = {}

    def fake_train(arrays, config, engine=None, seeds=None, **kw):
        captured["arrays"] = arrays
        return [{"val_metrics": [{"iou": 0.0}]} for _ in arrays]

    monkeypatch.setattr(fp, "train_folds_parallel", fake_train)
    cfg = dict(CFG, n_classes=3, loss_fn="ce_multiclass", num_epochs=1)
    fp.cv_train_folds_parallel(imgs, masks, [([0, 1, 2, 3], [4, 5])], cfg,
                               augmentations_per_image=1)
    tr_masks = np.asarray(captured["arrays"][0][1])
    va_masks = np.asarray(captured["arrays"][0][3])
    assert tr_masks.max() == 2.0, "train labels binarized"
    assert va_masks.max() == 2.0, "val labels binarized"
    assert set(np.unique(va_masks)) == {0.0, 1.0, 2.0}


def test_cross_validator_fold_parallel(tmp_path):
    """CrossValidator(fold_parallel=True) end-to-end equals the sequential
    CrossValidator on the same synthetic dataset and folds."""
    from segtpu.data.io import make_synthetic_dataset
    from segtpu.eval import CrossValidator

    data_dir = make_synthetic_dataset(str(tmp_path), n_images=8,
                                      image_type="W")
    cfg = dict(CFG, num_epochs=2, name="fp")
    kw = dict(data_dir=data_dir, image_type="W", n_splits=2,
              random_state=3, augmentations_per_image=1, verbose=False)
    seq = CrossValidator(**kw).cross_validate_single_model(config=cfg)
    par = CrossValidator(fold_parallel=True,
                         **kw).cross_validate_single_model(config=cfg)

    assert par["cv_summary"].keys() == seq["cv_summary"].keys()
    assert par["cv_summary"]["iou_mean"] == pytest.approx(
        seq["cv_summary"]["iou_mean"], abs=1e-2)
    assert par["cv_summary"]["loss_mean"] == pytest.approx(
        seq["cv_summary"]["loss_mean"], abs=1e-2)
