"""Decision-threshold sweep (segtpu/metrics/threshold.py): formula parity
with calculate_metrics at 0.5, known-optimum recovery, monotonicity, and
the Segmenter.sweep_threshold surface."""

import numpy as np
import pytest

from segtpu.metrics import calculate_metrics, sweep_thresholds


@pytest.fixture(scope="module")
def probs_masks():
    rng = np.random.default_rng(7)
    probs = rng.uniform(0, 1, (6, 24, 24, 1)).astype(np.float32)
    masks = (rng.uniform(0, 1, (6, 24, 24, 1)) < 0.3).astype(np.float32)
    return probs, masks


def test_matches_calculate_metrics_at_half(probs_masks):
    probs, masks = probs_masks
    sweep = sweep_thresholds(probs, masks, thresholds=[0.5])
    ref = {k: float(v) for k, v in calculate_metrics(probs, masks).items()}
    for k in ("precision", "recall", "f1", "iou", "accuracy"):
        assert sweep[k][0] == pytest.approx(ref[k], rel=1e-6), k


def test_matches_calculate_metrics_on_grid(probs_masks):
    """Every grid point must equal a thresholded calculate_metrics call —
    the vmapped sweep is an optimization, not a different formula."""
    probs, masks = probs_masks
    sweep = sweep_thresholds(probs, masks)
    for i, t in enumerate(sweep["thresholds"]):
        ref = calculate_metrics((probs > t).astype(np.float32), masks)
        assert sweep["iou"][i] == pytest.approx(float(ref["iou"]), rel=1e-6)


def test_recovers_known_optimal_threshold():
    """If targets ARE probs > 0.3, the 0.3-adjacent grid point is perfect
    (IoU 1) and wins the sweep."""
    rng = np.random.default_rng(3)
    probs = rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32)
    masks = (probs > 0.3).astype(np.float32)
    sweep = sweep_thresholds(probs, masks)
    assert sweep["best_threshold"] == pytest.approx(0.3, abs=1e-6)
    assert sweep["best_value"] == pytest.approx(1.0, abs=1e-4)
    assert sweep["metric"] == "iou"
    # 0.5 misclassifies the 0.3-0.5 band
    i_half = int(np.argmin(np.abs(sweep["thresholds"] - 0.5)))
    assert sweep["iou"][i_half] < 0.9


def test_recall_monotone_nonincreasing(probs_masks):
    probs, masks = probs_masks
    sweep = sweep_thresholds(probs, masks)
    assert np.all(np.diff(sweep["recall"]) <= 1e-9)


def test_best_by_other_metric(probs_masks):
    probs, masks = probs_masks
    sweep = sweep_thresholds(probs, masks, metric="f1")
    i = int(np.argmax(sweep["f1"]))
    assert sweep["best_threshold"] == sweep["thresholds"][i]
    assert sweep["best_value"] == sweep["f1"][i]


def test_validation_errors(probs_masks):
    probs, masks = probs_masks
    with pytest.raises(ValueError, match="thresholds"):
        sweep_thresholds(probs, masks, thresholds=[])
    with pytest.raises(ValueError, match="metric"):
        sweep_thresholds(probs, masks, metric="auc")


def test_segmenter_sweep_threshold_surface():
    """Segmenter.sweep_threshold == sweep over the model's own
    probabilities with evaluate()'s input contract (no training needed —
    the contract holds for any weights)."""
    import jax
    from segtpu.api import Segmenter

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (6, 32, 32), dtype=np.uint8)
    masks = (rng.uniform(0, 1, (6, 32, 32)) < 0.3).astype(np.uint8) * 255

    seg = Segmenter(backbone="resnet34", use_attention=False,
                    config={"img_size": (32, 32), "batch_size": 4})
    seg.state = seg.engine.init_state(jax.random.key(0), (1, 32, 32, 1),
                                      1e-3, 1e-5)
    sweep = seg.sweep_threshold(imgs, masks, thresholds=[0.3, 0.5, 0.7])

    probs = seg.predict_proba(imgs)
    ref = sweep_thresholds(probs, (masks > 0).astype(np.float32),
                           thresholds=[0.3, 0.5, 0.7])
    np.testing.assert_allclose(sweep["iou"], ref["iou"], rtol=1e-6)
    # thresholds round-trip through float32 (0.3 → 0.30000001…)
    assert min(abs(sweep["best_threshold"] - t)
               for t in (0.3, 0.5, 0.7)) < 1e-6
