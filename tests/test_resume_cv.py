"""Resumable experiment loops: a restarted CV run skips completed folds
(SURVEY.md §5 failure-recovery row)."""

import json
import os

import numpy as np
import pytest

from segtpu.data.io import make_synthetic_dataset
from segtpu.eval import CrossValidator

CFG = {
    "backbone": "resnet34", "use_attention": False, "batch_size": 4,
    "img_size": (32, 32), "num_epochs": 1, "loss_fn": "combo",
    "verbose": False, "save_plots": False, "name": "resumable",
}


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rescv")
    return make_synthetic_dataset(str(root), n_images=8, image_type="W")


def test_cv_resume_skips_completed_folds(data_dir, tmp_path):
    resume = str(tmp_path / "cv_state")
    cv = CrossValidator(data_dir=data_dir, image_type="W", n_splits=2,
                        random_state=42, augmentations_per_image=0,
                        verbose=False, resume_dir=resume)
    res1 = cv.cross_validate_single_model(config=dict(CFG))
    files = sorted(os.listdir(resume))
    assert files == ["resumable_fold0.json", "resumable_fold1.json"]

    # simulate a crash after fold 0: delete fold 1's checkpoint and corrupt
    # fold 0's value to prove it is reused, not recomputed
    os.remove(os.path.join(resume, "resumable_fold1.json"))
    with open(os.path.join(resume, "resumable_fold0.json")) as f:
        marker = json.load(f)
    marker["iou"] = 0.123456
    with open(os.path.join(resume, "resumable_fold0.json"), "w") as f:
        json.dump(marker, f)

    cv2 = CrossValidator(data_dir=data_dir, image_type="W", n_splits=2,
                         random_state=42, augmentations_per_image=0,
                         verbose=False, resume_dir=resume)
    res2 = cv2.cross_validate_single_model(config=dict(CFG))
    assert abs(res2["fold_results"][0]["iou"] - 0.123456) < 1e-9  # reused
    # fold 1 recomputed and matches the original run
    assert abs(res2["fold_results"][1]["iou"]
               - res1["fold_results"][1]["iou"]) < 1e-5
