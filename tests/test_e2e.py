"""End-to-end tests: quick_train learns on the synthetic fixture and
returns the reference result schema; CV / comparison / selection protocols
run end-to-end (SURVEY.md §4d)."""

import numpy as np
import pytest

import jax

from segtpu.data.io import make_synthetic_dataset
from segtpu.data.discovery import load_original_data
from segtpu.train.loop import quick_train, train_model


QUICK_CONFIG = {
    "backbone": "resnet34",
    "use_attention": False,
    "batch_size": 4,
    "img_size": (32, 32),
    "num_epochs": 3,
    "learning_rate": 1e-3,
    "weight_decay": 1e-5,
    "loss_fn": "combo",
    "verbose": False,
    "save_plots": False,
    "seed": 0,
}


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return make_synthetic_dataset(str(root), n_images=10, image_type="W")


def test_quick_train_schema_and_learning(data_dir):
    data = load_original_data(data_dir, image_type="W")
    tr_i, tr_m = data["image_paths"][:8], data["mask_paths"][:8]
    va_i, va_m = data["image_paths"][8:], data["mask_paths"][8:]

    results = quick_train(train_images=tr_i, train_masks=tr_m,
                          val_images=va_i, val_masks=va_m,
                          config=dict(QUICK_CONFIG, num_epochs=5))

    # reference result schema (train.py:234-244)
    for key in ("train_metrics", "val_metrics", "lr_history", "best_iou",
                "best_epoch", "best_model_state", "training_time",
                "final_train_metrics", "final_val_metrics"):
        assert key in results, key
    assert len(results["train_metrics"]) == len(results["val_metrics"])
    assert len(results["lr_history"]) == len(results["train_metrics"])
    for m in results["train_metrics"]:
        assert set(m) == {"precision", "recall", "f1", "iou", "accuracy",
                          "loss"}
    # learning happened
    assert results["train_metrics"][-1]["loss"] < \
        results["train_metrics"][0]["loss"]
    assert results["best_model_state"] is not None
    assert 0.0 <= results["best_iou"] <= 1.0


def test_train_model_with_augmentation(data_dir):
    data = load_original_data(data_dir, image_type="W")
    results = train_model(
        train_images=data["image_paths"][:6],
        train_masks=data["mask_paths"][:6],
        val_images=data["image_paths"][6:8],
        val_masks=data["mask_paths"][6:8],
        num_epochs=2, config=QUICK_CONFIG, augmentations_per_image=2)
    assert len(results["train_metrics"]) == 2


def test_early_stopping_triggers(data_dir):
    data = load_original_data(data_dir, image_type="W")
    cfg = dict(QUICK_CONFIG, early_stopping_patience=1,
               early_stopping_min_delta=0.5)  # impossible improvement bar
    results = train_model(
        train_images=data["image_paths"][:6],
        train_masks=data["mask_paths"][:6],
        val_images=data["image_paths"][6:8],
        val_masks=data["mask_paths"][6:8],
        num_epochs=20, config=cfg)
    assert len(results["train_metrics"]) < 20  # stopped early


def test_cross_validator_protocol(data_dir):
    from segtpu.eval import CrossValidator
    cv = CrossValidator(data_dir=data_dir, image_type="W", n_splits=2,
                        random_state=42, augmentations_per_image=0,
                        verbose=False)
    res = cv.cross_validate_single_model(
        config=dict(QUICK_CONFIG, num_epochs=2, name="smoke"))
    assert "cv_summary" in res and "fold_results" in res
    assert len(res["fold_results"]) == 2
    assert "iou_mean" in res["cv_summary"]
    assert "iou_std" in res["cv_summary"]
    for fold in res["fold_results"]:
        assert "training_time" in fold


def test_model_comparator_shared_folds_and_generalization(data_dir):
    from segtpu.eval import ModelComparator
    comparator = ModelComparator(data_dir=data_dir, image_type="W",
                                 test_size=0.2, n_splits=2, random_state=42,
                                 augmentations_per_image=0, verbose=False)
    configs = [
        (None, dict(QUICK_CONFIG, num_epochs=2, name="A", loss_fn="bce")),
        (None, dict(QUICK_CONFIG, num_epochs=2, name="B", loss_fn="dice")),
    ]
    cv_res = comparator.run_cv_comparison(configs)
    assert set(cv_res["comparison_summary"].keys()) == {"A", "B"}
    assert cv_res["cv_folds_used"] == 2

    gen = comparator.evaluate_generalization(configs)
    for name in ("A", "B"):
        assert "test_metrics" in gen[name]
        assert "final_train_iou" in gen[name]
        assert "training_time" in gen[name]


def test_forward_selection_smoke(data_dir, monkeypatch):
    from segtpu.experiments.forward_selection import AugmentationSelector
    cfg = dict(QUICK_CONFIG, image_type="W", num_epochs=2, batch_size=4,
               loss_fn="focal", focal_alpha=0.25, focal_gamma=2.0, seed=42)
    sel = AugmentationSelector(cfg, data_dir, improvement_threshold=0.005,
                               max_augmentations=1, cv_folds=2,
                               quick_evaluation=True)
    # limit the candidate pool for test speed
    sel.augmentation_candidates = ["horizontal_flip", "invert"]
    monkeypatch.setattr(sel, "quick_evaluation", True)
    results = sel.run_forward_selection(verbose=False)
    for key in ("selected_augmentations", "final_score", "baseline_score",
                "total_improvement", "selection_history", "config"):
        assert key in results
    assert 0.0 <= results["baseline_score"] <= 1.0


def test_quick_cv_and_comparison_conveniences(data_dir):
    """quick_cv / quick_model_comparison (cross_validation.py:427-448)."""
    from segtpu.eval import quick_cv, quick_model_comparison
    cfg = dict(QUICK_CONFIG, num_epochs=1, name="q")
    res = quick_cv(config=cfg, data_dir=data_dir, image_type="W",
                   n_splits=2, augmentations_per_image=0)
    assert "cv_summary" in res

    both = quick_model_comparison(
        [(None, dict(cfg, name="m1"))], data_dir=data_dir, image_type="W",
        n_splits=2, augmentations_per_image=0, include_generalization=True)
    assert "cv_results" in both and "generalization_results" in both


def test_cli_dispatch(monkeypatch):
    import segtpu.cli as cli
    calls = []
    import segtpu.experiments.loss_comparison as lc
    monkeypatch.setattr(lc, "main",
                        lambda **kw: calls.append(("loss", kw)))
    cli.main(["--experiment", "loss_function", "--data-dir", "x",
              "--quick"])
    assert calls and calls[0][0] == "loss"
    assert calls[0][1]["n_splits"] == 2


def test_train_model_input_validation():
    """Fail-fast guards: bare string / empty / mismatched inputs raise
    immediately instead of dying deep inside decode or augmentation."""
    with pytest.raises(TypeError, match="single string"):
        train_model(train_images="img.tif", train_masks="m.tif",
                    num_epochs=1)
    with pytest.raises(ValueError, match="empty image set"):
        train_model(train_images=[], train_masks=[], num_epochs=1)
    with pytest.raises(ValueError, match="length mismatch"):
        train_model(train_images=["a.tif", "b.tif"], train_masks=["a.tif"],
                    num_epochs=1)


def test_segmenter_prep_images_validation():
    import segtpu
    seg = segtpu.Segmenter(backbone="resnet34", use_attention=False,
                           config={"img_size": (32, 32)})
    with pytest.raises(TypeError, match="single string"):
        seg._prep_images("img.tif")
    with pytest.raises(ValueError, match="empty"):
        seg._prep_images([])
