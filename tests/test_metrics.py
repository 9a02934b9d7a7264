"""Tests for metrics: hand-computed confusion values + post-process vs scipy."""

import numpy as np
import jax
import jax.numpy as jnp

from segtpu.metrics import calculate_metrics, iou_score, post_process


def test_calculate_metrics_hand_example():
    pred = jnp.asarray([[0.9, 0.2], [0.7, 0.4]])  # binary: 1,0,1,0
    target = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    m = {k: float(v) for k, v in calculate_metrics(pred, target).items()}
    # tp=1 fp=1 fn=1 tn=1
    assert abs(m["precision"] - 0.5) < 1e-5
    assert abs(m["recall"] - 0.5) < 1e-5
    assert abs(m["f1"] - 0.5) < 1e-5
    assert abs(m["iou"] - 1 / 3) < 1e-4
    assert abs(m["accuracy"] - 0.5) < 1e-5


def test_calculate_metrics_jit(rng):
    pred = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32))
    t = jnp.asarray((rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32))
    eager = calculate_metrics(pred, t)
    jitted = jax.jit(calculate_metrics)(pred, t)
    for k in eager:
        assert abs(float(eager[k]) - float(jitted[k])) < 1e-6


def test_post_process_removes_small_objects():
    img = np.zeros((32, 32), np.float32)
    img[2:10, 2:10] = 1.0      # 64 px object — keep
    img[20:22, 20:22] = 1.0    # 4 px object — remove at min_size=15
    out = post_process(img, min_size=15)
    assert out[5, 5] == 1
    assert out[20, 20] == 0


def test_post_process_matches_scipy_reference(rng):
    from scipy import ndimage
    img = (rng.random((64, 64)) > 0.8).astype(np.float32)
    out = post_process(img, min_size=5)
    binary = (img > 0.5).astype(np.uint8)
    labeled, num = ndimage.label(binary)
    sizes = ndimage.sum(binary, labeled, range(1, num + 1))
    small = sizes < 5
    expected = binary.copy()
    expected[small[labeled - 1]] = 0
    assert np.array_equal(out, expected)


def test_iou_score_post_processing(rng):
    logits = rng.normal(0, 3, (1, 32, 32, 1)).astype(np.float32)
    target = (rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32)
    plain = iou_score(logits, target)
    pp = iou_score(logits, target, apply_post_processing=True, min_size=25)
    assert 0.0 <= plain <= 1.0 and 0.0 <= pp <= 1.0


def test_label_fallback_matches_scipy_exactly():
    """The scipy-free CCL fallback must be drop-in identical to
    scipy.ndimage.label (labels AND raster numbering), so post_process
    behaves the same whichever path runs (reference: utils.py:58-84)."""
    from scipy import ndimage

    from segtpu.metrics.metrics import _label_fallback

    rng = np.random.default_rng(7)
    cases = [(rng.random((37, 53)) < d).astype(np.uint8)
             for d in (0.05, 0.3, 0.5, 0.7, 0.95) for _ in range(3)]
    cases += [
        np.zeros((8, 8), np.uint8),           # empty
        np.ones((8, 8), np.uint8),            # one full component
        np.eye(16, dtype=np.uint8),           # diagonal: 4-conn splits it
    ]
    serp = np.zeros((21, 21), np.uint8)       # serpentine single component
    serp[::2, :] = 1
    serp[1::4, -1] = 1
    serp[3::4, 0] = 1
    cases.append(serp)

    for binary in cases:
        lab_s, num_s = ndimage.label(binary)
        lab_f, num_f, sizes_f = _label_fallback(binary)
        assert num_f == num_s
        assert np.array_equal(lab_f, lab_s)
        if num_s:
            sizes_s = ndimage.sum(binary, lab_s, range(1, num_s + 1))
            assert np.array_equal(np.asarray(sizes_s, np.int64), sizes_f)
