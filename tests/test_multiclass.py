"""Multi-class segmentation path: losses, metrics, and a learnable
3-class problem end-to-end (BASELINE.json config #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.losses.multiclass import (
    softmax_ce_loss,
    dice_loss_mc,
    combo_loss_mc,
    focal_loss_mc,
    get_multiclass_loss,
    calculate_metrics_multiclass,
)


@pytest.fixture
def mc_data(rng):
    logits = jnp.asarray(rng.normal(0, 2, (2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (2, 8, 8)).astype(np.int32))
    return logits, labels


def test_softmax_ce_matches_manual(mc_data):
    logits, labels = mc_data
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    l = np.asarray(labels)
    manual = -np.mean([logp[b, i, j, l[b, i, j]]
                       for b in range(2) for i in range(8) for j in range(8)])
    got = float(softmax_ce_loss(logits, labels))
    assert abs(got - manual) < 1e-5


def test_perfect_prediction_near_zero_loss(mc_data):
    _, labels = mc_data
    perfect = jax.nn.one_hot(labels, 3) * 50.0
    assert float(softmax_ce_loss(perfect, labels)) < 1e-3
    assert float(dice_loss_mc(perfect, labels)) < 1e-2
    m = calculate_metrics_multiclass(jax.nn.softmax(perfect, -1), labels)
    assert float(m["iou"]) > 0.99
    assert float(m["accuracy"]) > 0.99


def test_losses_finite_and_differentiable(mc_data):
    logits, labels = mc_data
    for fn in (softmax_ce_loss, dice_loss_mc, combo_loss_mc, focal_loss_mc):
        v = float(fn(logits, labels))
        assert np.isfinite(v)
        g = jax.grad(lambda x: fn(x, labels))(logits)
        assert np.isfinite(np.asarray(g)).all()


def test_registry(mc_data):
    logits, labels = mc_data
    for key in ("ce", "dice", "combo", "focal"):
        fn = get_multiclass_loss({"loss_fn": key})
        assert np.isfinite(float(fn(logits, labels)))


def _three_class_data(rng, n=16, s=32):
    imgs = rng.normal(0.2, 0.03, (n, s, s, 1)).astype(np.float32)
    labels = np.zeros((n, s, s, 1), np.float32)
    yy, xx = np.mgrid[0:s, 0:s]
    for i in range(n):
        cy, cx = rng.integers(8, 24, 2)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 30
        cls = 1 + (i % 2)
        imgs[i, blob, 0] += 0.3 * cls
        labels[i, blob, 0] = cls
    return imgs, labels


def test_multiclass_engine_learns(rng):
    """3-class problem: background / dim blob / bright blob."""
    from segtpu.train.engine import get_engine
    from segtpu.data.loader import DeviceDataLoader

    n, s = 16, 32
    imgs = rng.normal(0.2, 0.03, (n, s, s, 1)).astype(np.float32)
    labels = np.zeros((n, s, s, 1), np.float32)
    yy, xx = np.mgrid[0:s, 0:s]
    for i in range(n):
        cy, cx = rng.integers(8, 24, 2)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 30
        cls = 1 + (i % 2)
        imgs[i, blob, 0] += 0.3 * cls
        labels[i, blob, 0] = cls

    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "n_classes": 3, "loss_fn": "combo"})
    assert engine.multiclass
    state = engine.init_state(jax.random.key(0), (1, s, s, 1), 1e-3, 1e-5)
    loader = DeviceDataLoader.from_arrays(jnp.asarray(imgs),
                                          jnp.asarray(labels), 4,
                                          shuffle=True, seed=0)
    state, m0 = engine.run_train_epoch(state, loader, 1e-3, jax.random.key(1))
    for i in range(11):
        state, m = engine.run_train_epoch(state, loader, 1e-3,
                                          jax.random.key(2 + i))
    assert m["loss"] < m0["loss"]
    assert m["accuracy"] > 0.9  # background dominance alone gives ~0.9
    assert m["iou"] > 0.4, m


# ------------------------------------------------------------------ API
# VERDICT r4 item 5: multiclass through the PUBLIC surface — train →
# predict (argmax) → predict_proba (softmax) → evaluate (macro metrics),
# plus TTA and tiled composition.

@pytest.fixture(scope="module")
def fitted_mc_segmenter():
    from segtpu.api import Segmenter
    rng = np.random.default_rng(7)
    imgs, labels = _three_class_data(rng, n=12, s=32)
    seg = Segmenter(backbone="resnet34", use_attention=False, n_classes=3,
                    config={"img_size": (32, 32), "batch_size": 4,
                            "num_epochs": 2, "verbose": False,
                            "save_plots": False, "loss_fn": "combo"})
    seg.fit(imgs[:, :, :, 0], labels[:, :, :, 0])
    return seg, imgs, labels


def test_api_predict_proba_is_softmax(fitted_mc_segmenter):
    seg, imgs, _ = fitted_mc_segmenter
    probs = seg.predict_proba(imgs[:4, :, :, 0].astype(np.float32))
    assert probs.shape == (4, 32, 32, 3)
    assert np.all(probs >= 0)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)


def test_api_predict_is_argmax(fitted_mc_segmenter):
    seg, imgs, _ = fitted_mc_segmenter
    x = imgs[:4, :, :, 0].astype(np.float32)
    probs = seg.predict_proba(x)
    masks = seg.predict(x)
    assert masks.shape == (4, 32, 32, 1)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1, 2}
    np.testing.assert_array_equal(masks[..., 0], np.argmax(probs, axis=-1))


def test_api_predict_rejects_binary_postprocess(fitted_mc_segmenter):
    seg, imgs, _ = fitted_mc_segmenter
    with pytest.raises(ValueError, match="BINARY"):
        seg.predict(imgs[:2, :, :, 0].astype(np.float32),
                    post_process_min_size=5)


def test_api_evaluate_multiclass_metrics(fitted_mc_segmenter):
    seg, imgs, labels = fitted_mc_segmenter
    m = seg.evaluate(imgs[:8, :, :, 0].astype(np.float32),
                     labels[:8, :, :, 0])
    for k in ("precision", "recall", "f1", "iou", "accuracy", "loss"):
        assert k in m and np.isfinite(m[k]), (k, m)
    # macro metrics, and loss is the softmax CE-family value — all in range
    assert 0.0 <= m["iou"] <= 1.0
    assert 0.0 <= m["accuracy"] <= 1.0


def test_api_evaluate_matches_engine_multiclass_metrics(fitted_mc_segmenter):
    """evaluate() must score with calculate_metrics_multiclass — recompute
    the macro metrics by hand from predict_proba and compare."""
    seg, imgs, labels = fitted_mc_segmenter
    x = imgs[:8, :, :, 0].astype(np.float32)
    t = labels[:8, :, :, 0]
    m = seg.evaluate(x, t)
    # evaluate() normalizes via _materialize; hand predict_proba the SAME
    # normalized model inputs (float arrays pass through _prep_images)
    from segtpu.train.loop import _materialize, _to_canonical
    ci, cm = _to_canonical(x, t, (32, 32))
    xn, _ = _materialize(ci, cm, 3)
    xn = np.asarray(xn)
    # batch_size=4 → two equal batches; sample-weighted mean == mean of
    # per-batch macro metrics
    vals = []
    for i in (0, 4):
        probs = seg.predict_proba(xn[i:i + 4])
        vals.append(calculate_metrics_multiclass(jnp.asarray(probs),
                                                 jnp.asarray(t[i:i + 4])))
    for k in ("iou", "accuracy"):
        manual = float(np.mean([float(v[k]) for v in vals]))
        assert abs(m[k] - manual) < 1e-4, (k, m[k], manual)


def test_api_tta_multiclass_probs(fitted_mc_segmenter):
    seg, imgs, _ = fitted_mc_segmenter
    probs = seg.predict_proba(imgs[:2, :, :, 0].astype(np.float32), tta=True)
    assert probs.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)


def test_api_tiled_multiclass(fitted_mc_segmenter):
    seg, _, _ = fitted_mc_segmenter
    rng = np.random.default_rng(3)
    big = rng.normal(0.2, 0.03, (48, 48)).astype(np.float32)
    probs = seg.predict_tiled(big, tile=32, overlap=8, batch_tiles=4)
    assert probs.shape == (48, 48, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=-1), 1.0,
                               atol=1e-4)


def test_api_sweep_threshold_rejects_multiclass(fitted_mc_segmenter):
    seg, imgs, labels = fitted_mc_segmenter
    with pytest.raises(ValueError, match="binary"):
        seg.sweep_threshold(imgs[:4, :, :, 0].astype(np.float32),
                            labels[:4, :, :, 0])


def test_augmenter_preserves_class_labels(rng):
    """Production augmenter in label mode: every augmented mask value stays
    in the input label set (nearest mask sampling + integer round-trip)."""
    from segtpu.data.augment import CellAugmenter
    imgs = (rng.random((6, 32, 32)) * 255).astype(np.uint8)
    labels = rng.integers(0, 4, (6, 32, 32)).astype(np.uint8)
    aug = CellAugmenter(augmentations_per_image=2, seed=0, n_classes=4)
    ai, am = aug.augment_training_data(imgs, labels)
    assert ai.shape == (18, 32, 32) and am.shape == (18, 32, 32)
    assert set(np.unique(np.asarray(am))) <= {0, 1, 2, 3}
    # originals pass through unchanged at the front
    np.testing.assert_array_equal(np.asarray(am[:6]), labels)


def test_train_model_rejects_out_of_range_labels(rng):
    from segtpu.api import Segmenter
    imgs, labels = _three_class_data(rng, n=8, s=32)
    labels[0, 0, 0, 0] = 7  # out of range for n_classes=3
    seg = Segmenter(backbone="resnet34", use_attention=False, n_classes=3,
                    config={"img_size": (32, 32), "batch_size": 4,
                            "num_epochs": 1, "verbose": False,
                            "save_plots": False})
    with pytest.raises(ValueError, match="n_classes"):
        seg.fit(imgs[:, :, :, 0], labels[:, :, :, 0])
