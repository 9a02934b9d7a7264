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
