"""Experiment-driver end-to-end smoke tests at fixture scale: each of the
four drivers must run to completion, write its JSON artifacts and plots
(SURVEY.md §2.1 #17-20)."""

import glob
import json
import os

import numpy as np
import pytest

from segtpu.data.io import make_synthetic_dataset

SMALL = {
    "backbone": "resnet34",
    "use_attention": False,
    "batch_size": 4,
    "img_size": (32, 32),
    "num_epochs": 1,
    "n_splits": 2,
    "verbose": False,
}


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    return make_synthetic_dataset(str(root), n_images=8, image_type="W")


def test_loss_configurations_match_reference():
    """The 10 loss configs pin to loss_function_cross_validation.py:37-57
    (names, keys, hyperparameters)."""
    from segtpu.experiments.loss_comparison import get_loss_configurations
    configs = get_loss_configurations()
    by_name = {c["name"]: c for c in configs}
    assert list(by_name) == [
        "BCE Loss", "Weighted BCE", "Balanced BCE", "Focal Loss",
        "Dice Loss", "Tversky Loss", "Focal Tversky",
        "Sensitivity-Specificity", "Log-Cosh Dice", "Combo Loss"]
    assert by_name["Weighted BCE"]["beta"] == 2.0
    assert by_name["Focal Loss"]["focal_alpha"] == 0.25
    assert by_name["Focal Loss"]["focal_gamma"] == 2.0
    assert by_name["Focal Tversky"]["focal_tversky_gamma"] == 0.75
    assert by_name["Combo Loss"]["loss_alpha"] == 0.5
    for c in configs:  # shared base (reference base_config :20-33)
        assert c["backbone"] == "resnet34"
        assert c["use_attention"] is False
        assert c["batch_size"] == 4
        assert tuple(c["img_size"]) == (128, 128)
        assert c["learning_rate"] == 1e-3
        assert c["early_stopping_patience"] == 5


def test_loss_comparison_driver(data_dir, tmp_path):
    from segtpu.experiments.loss_comparison import main
    out = main(data_dir=data_dir, image_type="W", n_splits=2, test_size=0.25,
               augmentations_per_image=0, base_overrides=SMALL,
               save_root=str(tmp_path), loss_filter=["bce", "dice"])
    assert "cv_results" in out and "generalization_results" in out
    save_dir = out["save_dir"]
    assert os.path.exists(os.path.join(save_dir, "cv_results.json"))
    assert os.path.exists(os.path.join(save_dir,
                                       "generalization_results.json"))
    assert os.path.exists(os.path.join(save_dir, "cv_loss_comparison.png"))
    with open(os.path.join(save_dir, "cv_results.json")) as f:
        data = json.load(f)
    assert len(data["cv_results"]["comparison_summary"]) == 2


def test_augmentation_amount_driver(data_dir, tmp_path):
    from segtpu.experiments.augmentation_amount import main
    out = main(data_dir=data_dir, image_type="W",
               augmentation_amounts=[0, 1],
               base_overrides=dict(SMALL, data_dir=data_dir,
                                   random_state=42, loss_fn="bce"),
               save_root=str(tmp_path))
    assert set(out["augmentation_results"].keys()) == {0, 1}
    r = out["augmentation_results"][1]
    assert r["data_multiplier"] == 2
    assert abs(r["efficiency_iou"] - r["mean_iou"] / 2) < 1e-9
    files = glob.glob(str(tmp_path) + "/augmentation_amount_*/*")
    names = {os.path.basename(f) for f in files}
    assert "augmentation_amount_results.json" in names
    assert "augmentation_amount_summary.json" in names
    assert "augmentation_amount_results.png" in names


def test_model_configuration_driver(data_dir, tmp_path):
    from segtpu.experiments.model_configuration import main
    out = main(data_dir=data_dir, image_type="W",
               configuration_options={"use_attention": [False],
                                      "batch_size": [4]},
               base_overrides=dict(SMALL, augmentations_per_image=0,
                                   test_size=0.25),
               save_root=str(tmp_path))
    assert "cv_results" in out and "generalization_results" in out
    files = glob.glob(str(tmp_path) + "/model_configuration_*/*")
    names = {os.path.basename(f) for f in files}
    assert "model_configuration_results.json" in names
    assert "model_configuration_summary.json" in names


def test_forward_selection_driver(data_dir, tmp_path, monkeypatch):
    from segtpu.experiments import forward_selection as fs
    # shrink the candidate pool for a smoke run
    monkeypatch.setattr(
        fs, "AUGMENTATION_CANDIDATES",
        {k: v for k, v in fs.AUGMENTATION_CANDIDATES.items()
         if k in ("horizontal_flip",)})
    results, pipeline = fs.run_augmentation_selection_experiment(
        data_dir=data_dir,
        config_overrides=dict(SMALL, image_type="W", num_epochs=1,
                              loss_fn="focal"),
        max_augmentations=1, cv_folds=2, quick_evaluation=True,
        save_root=str(tmp_path))
    assert "selected_augmentations" in results
    out = os.path.join(str(tmp_path), "augmentation_selection_results",
                       "results.json")
    assert os.path.exists(out)
    assert callable(pipeline)
