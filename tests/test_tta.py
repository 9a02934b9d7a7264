"""D4 test-time augmentation: transform exactness + averaging parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from segtpu.infer.tta import (D4_ELEMENTS, _apply_d4, _invert_d4,
                              tta_elements, tta_predict, tta_predict_proba)


class _TinyNet(nn.Module):
    """Deliberately orientation-SENSITIVE 2-conv net with the same apply
    contract as the U-Net (params + batch_stats collections, train kwarg)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(4, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        return nn.Conv(1, (3, 3), padding="SAME")(x)


class _State:
    def __init__(self, params, batch_stats):
        self.params = params
        self.batch_stats = batch_stats


def _tiny_state(rng_key, shape):
    m = _TinyNet()
    v = m.init(rng_key, jnp.zeros(shape), train=False)
    return m, _State(v["params"], v["batch_stats"])


def test_d4_roundtrip_exact(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    for k, t in D4_ELEMENTS:
        back = _invert_d4(_apply_d4(x, k, t), k, t)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_d4_elements_distinct(rng):
    """The 8 elements act distinctly (i.e. we really cover D4)."""
    x = jnp.asarray(rng.random((1, 5, 5, 1)).astype(np.float32))
    images = [np.asarray(_apply_d4(x, k, t)).tobytes()
              for k, t in D4_ELEMENTS]
    assert len(set(images)) == 8


def test_tta_matches_manual_average_square(rng):
    m, state = _tiny_state(jax.random.key(0), (1, 8, 8, 1))
    x = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32))

    got = np.asarray(tta_predict_proba(m, state, x))

    def fwd(v):
        return jax.nn.sigmoid(m.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            v, train=False))

    manual = np.mean([np.asarray(_invert_d4(fwd(_apply_d4(x, k, t)), k, t))
                      for k, t in D4_ELEMENTS], axis=0)
    np.testing.assert_allclose(got, manual, atol=1e-6)


def test_tta_rectangular_uses_flips(rng):
    m, state = _tiny_state(jax.random.key(1), (1, 6, 10, 1))
    x = jnp.asarray(rng.random((1, 6, 10, 1)).astype(np.float32))

    got = np.asarray(tta_predict_proba(m, state, x))
    assert got.shape == (1, 6, 10, 1)

    def fwd(v):
        return jax.nn.sigmoid(m.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            v, train=False))

    flips = tta_elements(square=False)
    assert len(flips) == 4
    outs = []
    for fh, fv in flips:
        v = x
        if fh:
            v = jnp.flip(v, axis=2)
        if fv:
            v = jnp.flip(v, axis=1)
        o = fwd(v)
        if fh:
            o = jnp.flip(o, axis=2)
        if fv:
            o = jnp.flip(o, axis=1)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(got, np.mean(outs, axis=0), atol=1e-6)


def test_tta_equivariant_function_is_identity_average(rng):
    """For an orientation-EQUIVARIANT apply (pointwise), every variant
    predicts the same map, so TTA must equal the plain prediction."""

    class _Pointwise(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            nn.BatchNorm(use_running_average=True)(x)  # batch_stats col
            return x * 2.0 - 1.0

    m = _Pointwise()
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)), train=False)
    state = _State(v["params"], v.get("batch_stats", {}))
    x = jnp.asarray(rng.random((1, 8, 8, 1)).astype(np.float32))
    got = np.asarray(tta_predict_proba(m, state, x))
    plain = np.asarray(jax.nn.sigmoid(x * 2.0 - 1.0))
    np.testing.assert_allclose(got, plain, atol=1e-6)


def test_tta_predict_thresholds(rng):
    m, state = _tiny_state(jax.random.key(2), (1, 8, 8, 1))
    x = rng.random((2, 8, 8, 1)).astype(np.float32)
    masks = tta_predict(m, state, x)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)).issubset({0, 1})


def test_tiled_tta_single_tile_matches_batch_tta(rng):
    """tiled_predict(tta=True) on an image that is exactly one tile must
    equal the plain batch TTA (blending is a no-op there)."""
    from segtpu.infer.tiled import tiled_predict

    m, state = _tiny_state(jax.random.key(4), (1, 16, 16, 1))
    img = rng.random((16, 16, 1)).astype(np.float32)
    got = tiled_predict(m, state, img, tile=16, overlap=0, batch_tiles=1,
                        tta=True)
    want = np.asarray(tta_predict_proba(m, state, img[None]))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tiled_tta_multi_tile_shape_and_range(rng):
    from segtpu.infer.tiled import tiled_predict

    m, state = _tiny_state(jax.random.key(5), (1, 16, 16, 1))
    img = rng.random((24, 28, 1)).astype(np.float32)
    got = tiled_predict(m, state, img, tile=16, overlap=8, batch_tiles=2,
                        tta=True)
    assert got.shape == (24, 28, 1)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_tiled_tta_halo_mode(rng):
    """TTA composes with halo tiling: square haloed tiles get the full
    D4 average before the center crop; output stays a calibrated
    probability map."""
    from segtpu.infer.tiled import tiled_predict

    m, state = _tiny_state(jax.random.key(6), (1, 16, 16, 1))
    img = rng.random((24, 28, 1)).astype(np.float32)
    got = tiled_predict(m, state, img, tile=16, overlap=8, batch_tiles=4,
                        tta=True, mode="halo")
    assert got.shape == (24, 28, 1)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_tta_rejects_non_batch(rng):
    m, state = _tiny_state(jax.random.key(3), (1, 8, 8, 1))
    with pytest.raises(ValueError):
        tta_predict_proba(m, state, rng.random((8, 8, 1)))
