"""Golden-value tests for all 16 losses against independent numpy
implementations of the published formulas (and scipy for the EDT losses)."""

import numpy as np
import pytest

import jax.numpy as jnp
from scipy.ndimage import distance_transform_edt as scipy_edt

import segtpu.losses as L


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_bce(logits, t):
    return np.maximum(logits, 0) - logits * t + np.log1p(np.exp(-np.abs(logits)))


@pytest.fixture
def data(rng):
    logits = rng.normal(0, 2, (2, 16, 16, 1)).astype(np.float32)
    targets = (rng.random((2, 16, 16, 1)) > 0.7).astype(np.float32)
    return logits, targets


def test_dice(data):
    logits, t = data
    p = _np_sigmoid(logits).reshape(-1)
    tf = t.reshape(-1)
    inter = (p * tf).sum()
    union = p.sum() + tf.sum()
    expected = 1 - (2 * inter + 1.0) / (union + 1.0)
    got = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-5


def test_bce(data):
    logits, t = data
    expected = _np_bce(logits, t).mean()
    got = float(L.bce_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-5


def test_weighted_bce(data):
    logits, t = data
    w = t * 2.0 + (1 - t)
    expected = (_np_bce(logits, t) * w).mean()
    got = float(L.weighted_bce_loss(jnp.asarray(logits), jnp.asarray(t), beta=2.0))
    assert abs(got - expected) < 1e-5


def test_balanced_bce(data):
    logits, t = data
    beta = 1 - t.sum() / t.size
    w = t * beta + (1 - t) * (1 - beta)
    expected = (_np_bce(logits, t) * w).mean()
    got = float(L.balanced_bce_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-5


def test_focal(data):
    logits, t = data
    bce = _np_bce(logits, t)
    pt = np.exp(-bce)
    expected = (0.25 * (1 - pt) ** 2.0 * bce).mean()
    got = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-5


def test_tversky(data):
    logits, t = data
    p = _np_sigmoid(logits).reshape(-1)
    tf = t.reshape(-1)
    tp = (p * tf).sum(); fp = ((1 - tf) * p).sum(); fn = (tf * (1 - p)).sum()
    expected = 1 - (tp + 1) / (tp + 0.3 * fp + 0.7 * fn + 1)
    got = float(L.tversky_loss(jnp.asarray(logits), jnp.asarray(t), alpha=0.3, beta=0.7))
    assert abs(got - expected) < 1e-5


def test_focal_tversky(data):
    logits, t = data
    tv = float(L.tversky_loss(jnp.asarray(logits), jnp.asarray(t)))
    got = float(L.focal_tversky_loss(jnp.asarray(logits), jnp.asarray(t), gamma=0.75))
    assert abs(got - tv ** 0.75) < 1e-5


def test_sensitivity_specificity(data):
    logits, t = data
    p = _np_sigmoid(logits).reshape(-1)
    tf = t.reshape(-1)
    tp = (p * tf).sum(); tn = ((1 - p) * (1 - tf)).sum()
    fp = ((1 - tf) * p).sum(); fn = (tf * (1 - p)).sum()
    sens = tp / (tp + fn + 1e-7); spec = tn / (tn + fp + 1e-7)
    expected = 1 - (0.5 * sens + 0.5 * spec)
    got = float(L.sensitivity_specificity_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-5


def test_log_cosh_dice(data):
    logits, t = data
    d = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(t)))
    got = float(L.log_cosh_dice_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - np.log(np.cosh(d))) < 1e-4


def test_combo(data):
    logits, t = data
    b = float(L.bce_loss(jnp.asarray(logits), jnp.asarray(t)))
    d = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(t)))
    got = float(L.combo_loss(jnp.asarray(logits), jnp.asarray(t), alpha=0.5))
    assert abs(got - (0.5 * b + 0.5 * d)) < 1e-5


def test_exponential_logarithmic(data):
    logits, t = data
    d = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(t)))
    exp_dice = (-np.log(np.clip(1 - d, 1e-7, None))) ** 0.3
    p = _np_sigmoid(logits)
    ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    exp_cross = np.mean((-np.log(np.clip(1 - ce, 1e-7, None))) ** 0.3)
    expected = 0.5 * exp_dice + 0.5 * exp_cross
    got = float(L.exponential_logarithmic_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-4


def test_distance_map_bce(data):
    logits, t = data
    dists = []
    for b in range(t.shape[0]):
        d = scipy_edt(t[b, :, :, 0])
        dists.append(d / (d.max() + 1e-7))
    dist = np.stack(dists)[..., None]
    w = 1 + 1.0 * dist
    expected = (w * _np_bce(logits, t)).mean()
    got = float(L.distance_map_bce_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-4


def test_hausdorff(data):
    logits, t = data
    p = _np_sigmoid(logits)

    def dtm(img):
        field = np.zeros_like(img)
        for b in range(img.shape[0]):
            if img[b, :, :, 0].max() > 0:
                field[b, :, :, 0] = scipy_edt(img[b, :, :, 0])
        return field / (field.max() + 1e-7)

    pd, td = dtm(p), dtm(t)
    expected = (((p - t) ** 2) * (pd ** 2 + td ** 2)).mean()
    got = float(L.hausdorff_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) < 1e-4


def test_boundary_matches_torch(data):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF
    logits, t = data
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(t, (0, 3, 1, 2)))
    theta0, theta = 3, 5
    dil = TF.max_pool2d(tt, kernel_size=theta0, stride=1, padding=theta0 // 2)
    ero = -TF.max_pool2d(-tt, kernel_size=theta0, stride=1, padding=theta0 // 2)
    boundary = dil - ero
    sigma = theta / 3.0
    coords = torch.arange(theta).float() - (theta - 1) / 2.0
    g = coords ** 2
    k = (-(g.unsqueeze(0) + g.unsqueeze(1)) / (2 * sigma ** 2)).exp()
    k /= k.sum()
    k = k.view(1, 1, theta, theta)
    boundary = TF.conv2d(boundary, k, padding=theta // 2)
    wm = 1 + 10 * boundary
    bce = TF.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    expected = float((wm * bce).mean())
    got = float(L.boundary_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - expected) / abs(expected) < 1e-4


def test_triple_combo(data):
    logits, t = data
    d = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(t)))
    b = float(L.bce_loss(jnp.asarray(logits), jnp.asarray(t)))
    f = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(t)))
    got = float(L.triple_combo_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - (0.33 * d + 0.33 * b + 0.34 * f)) < 1e-5


def test_registry_keys_and_fallback(data, capsys):
    logits, t = map(jnp.asarray, data)
    for key in L.available_losses():
        fn = L.get_loss_function({"loss_fn": key})
        val = float(fn(logits, t))
        assert np.isfinite(val), key
        assert fn.name == key if key not in ("tversky_balanced", "tversky_recall") else True
    fn = L.get_loss_function({"loss_fn": "nonexistent"})
    out = capsys.readouterr().out
    assert "Unknown loss function" in out
    combo = float(L.combo_loss(logits, t))
    assert abs(float(fn(logits, t)) - combo) < 1e-6


def test_registry_hyperparams(data):
    logits, t = map(jnp.asarray, data)
    fn = L.get_loss_function({"loss_fn": "tversky", "tversky_alpha": 0.3,
                              "tversky_beta": 0.7})
    expected = float(L.tversky_loss(logits, t, alpha=0.3, beta=0.7))
    assert abs(float(fn(logits, t)) - expected) < 1e-6


def test_losses_are_differentiable(data):
    import jax
    logits, t = map(jnp.asarray, data)
    for key in L.available_losses():
        fn = L.get_loss_function({"loss_fn": key})
        g = jax.grad(lambda x: fn(x, t))(logits)
        assert np.isfinite(np.array(g)).all(), key
