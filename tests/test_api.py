"""Public fit/predict/evaluate API tests (BASELINE.json surface)."""

import numpy as np
import pytest

from segtpu.api import Segmenter
from segtpu.data.io import make_synthetic_dataset
from segtpu.data.discovery import load_original_data


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    root = tmp_path_factory.mktemp("api")
    data_dir = make_synthetic_dataset(str(root), n_images=10, image_type="W")
    data = load_original_data(data_dir, image_type="W")
    seg = Segmenter(backbone="resnet34", use_attention=False,
                    config={"img_size": (32, 32), "batch_size": 4,
                            "num_epochs": 2, "verbose": False,
                            "save_plots": False, "loss_fn": "combo"})
    seg.fit(data["image_paths"], data["mask_paths"])
    return seg, data


def test_fit_produces_state_and_history(fitted):
    seg, _ = fitted
    assert seg.state is not None
    assert "best_iou" in seg.history


def test_predict_shapes_and_range(fitted):
    seg, data = fitted
    probs = seg.predict_proba(data["image_paths"][:3])
    assert probs.shape == (3, 32, 32, 1)
    assert probs.min() >= 0 and probs.max() <= 1
    masks = seg.predict(data["image_paths"][:3])
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)).issubset({0, 1})


def test_predict_with_post_processing(fitted):
    seg, data = fitted
    masks = seg.predict(data["image_paths"][:2], post_process_min_size=5)
    assert masks.shape == (2, 32, 32, 1)
    # regression (round-5 review): the cleanup must actually be WIRED —
    # a min_size larger than the whole image removes every component,
    # while the plain prediction has foreground
    plain = seg.predict(data["image_paths"][:2])
    assert plain.sum() > 0
    cleaned = seg.predict(data["image_paths"][:2],
                          post_process_min_size=32 * 32 + 1)
    assert cleaned.sum() == 0


def test_predict_tta(fitted):
    seg, data = fitted
    probs = seg.predict_proba(data["image_paths"][:2], tta=True)
    assert probs.shape == (2, 32, 32, 1)
    assert probs.min() >= 0 and probs.max() <= 1
    masks = seg.predict(data["image_paths"][:2], tta=True)
    assert set(np.unique(masks)).issubset({0, 1})


def test_predict_chunked_matches_single_dispatch(fitted):
    """chunk=N must give identical probabilities to one dispatch (incl.
    the zero-padded remainder chunk) while reusing one program."""
    seg, data = fitted
    paths = data["image_paths"][:5]
    whole = seg.predict_proba(paths)
    chunked = seg.predict_proba(paths, chunk=2)   # 2+2+1(+1 pad)
    np.testing.assert_allclose(chunked, whole, atol=1e-6)


def test_evaluate_metrics(fitted):
    seg, data = fitted
    m = seg.evaluate(data["image_paths"][:4], data["mask_paths"][:4])
    for k in ("precision", "recall", "f1", "iou", "accuracy", "loss"):
        assert k in m
        assert np.isfinite(m[k])


def test_save_load_roundtrip(fitted, tmp_path):
    seg, data = fitted
    before = seg.predict_proba(data["image_paths"][:2])
    seg.save(str(tmp_path))
    seg2 = Segmenter(backbone="resnet34", use_attention=False,
                     config={"img_size": (32, 32), "batch_size": 4})
    seg2.load(str(tmp_path))
    after = seg2.predict_proba(data["image_paths"][:2])
    np.testing.assert_allclose(before, after, atol=1e-6)


def test_from_checkpoint_is_self_describing(fitted, tmp_path):
    """The checkpoint's JSON sidecar carries the architecture: restoring
    needs no backbone/img_size re-specification, and a mismatched default
    construction gets corrected by load()."""
    seg, data = fitted
    before = seg.predict_proba(data["image_paths"][:2])
    seg.save(str(tmp_path))

    restored = Segmenter.from_checkpoint(str(tmp_path))
    assert restored.config["backbone"] == "resnet34"
    assert restored.config["use_attention"] is False
    assert tuple(restored.config["img_size"]) == (32, 32)
    np.testing.assert_allclose(
        restored.predict_proba(data["image_paths"][:2]), before, atol=1e-6)

    # load() on a differently-configured instance rebuilds the engine
    wrong = Segmenter(backbone="resnet34", use_attention=True)  # mismatched
    wrong.load(str(tmp_path))
    np.testing.assert_allclose(
        wrong.predict_proba(data["image_paths"][:2]), before, atol=1e-6)


def test_load_keeps_callers_training_settings(fitted, tmp_path):
    """load() restores ONLY architecture-determining sidecar keys: the
    caller's training plan (num_epochs, batch_size, lr, ...) must survive
    (ADVICE r3 — the full-config restore lives in from_checkpoint)."""
    seg, data = fitted
    seg.save(str(tmp_path))
    seg2 = Segmenter(backbone="resnet34", use_attention=False,
                     config={"img_size": (32, 32), "batch_size": 7,
                             "num_epochs": 3, "learning_rate": 5e-4})
    seg2.load(str(tmp_path))
    assert seg2.config["batch_size"] == 7
    assert seg2.config["num_epochs"] == 3
    assert seg2.config["learning_rate"] == 5e-4
    assert isinstance(seg2.config["img_size"], tuple)
    # from_checkpoint DOES restore the full config, tuples intact
    seg3 = Segmenter.from_checkpoint(str(tmp_path))
    assert isinstance(seg3.config["img_size"], tuple)


def test_predict_tiled(fitted):
    seg, _ = fitted
    big = np.random.default_rng(0).random((96, 96)).astype(np.float32)
    out = seg.predict_tiled(big, tile=32, overlap=8, batch_tiles=2)
    assert out.shape == (96, 96, 1)
