"""Visualization trio smoke tests (SURVEY.md §2.1 #21)."""

import os

import numpy as np
import pytest

import jax

from segtpu.data.io import make_synthetic_dataset
from segtpu.data.discovery import load_original_data
from segtpu.data.loader import prepare_data
from segtpu.metrics import compute_foreground_ratio


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("viz")
    make_synthetic_dataset(str(root), n_images=4, image_type="W")
    make_synthetic_dataset(str(root), n_images=2, image_type="B", seed=1)
    return str(root)


def test_visualize_predictions(data_dir, tmp_path):
    from segtpu.viz import visualize_predictions
    from segtpu.train.engine import get_engine

    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "bce"})
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 0.0)
    data = load_original_data(data_dir, image_type="W")
    loader = prepare_data(data["image_paths"], data["mask_paths"],
                          batch_size=2, img_size=(32, 32), shuffle=False)
    out = str(tmp_path / "pred.png")
    fig = visualize_predictions(engine, state, loader, num_samples=2,
                                save_path=out)
    assert fig is not None
    assert os.path.exists(out)


def test_plot_broadband_vs_fluorescence(data_dir, tmp_path):
    from segtpu.viz import plot_broadband_vs_fluorescence
    out = str(tmp_path / "cmp.pdf")
    plot_broadband_vs_fluorescence(data_dir, save_path=out)
    assert os.path.exists(out)


def test_plot_class_imbalance(data_dir, tmp_path):
    from segtpu.viz import plot_class_imbalance
    out = str(tmp_path / "imb.pdf")
    ratio = plot_class_imbalance(image_type="W", data_dir=data_dir,
                                 img_size=(32, 32), save_path=out)
    assert 0.0 < ratio < 1.0
    assert os.path.exists(out)


def test_foreground_ratio_reference_signature(data_dir):
    r = compute_foreground_ratio(image_type="W", data_dir=data_dir,
                                 img_size=(32, 32))
    assert 0.0 < r < 1.0
