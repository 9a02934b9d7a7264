"""Spatial halo-exchange parallelism tests (8-virtual-device CPU mesh).

Exactness contract: the row-sharded predictor equals (a) the plain
forward for identity-style apply_fns, (b) the DENSE forward on every
pixel whose receptive field is satisfied by the halo, and (c) the
single-device halo-tiled predictor's semantics. Plus communication-shape
pins: the lowered program contains collective-permute, never an
all-gather of the image.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.core.dist import create_mesh
from segtpu.parallel import make_spatial_sharded_predictor


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(axis_names=("data",))


def test_identity_exact(mesh):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(64, 40, 1)).astype(np.float32))
    pred = make_spatial_sharded_predictor(lambda x: x * 2.0, mesh, halo=4)
    out = np.asarray(pred(img))
    np.testing.assert_allclose(out, np.asarray(img) * 2.0, atol=1e-6)


def test_matches_dense_for_small_receptive_field(mesh):
    """2-layer 3×3 conv stack (receptive radius 2) with halo 4: the
    sharded result equals the dense forward EXACTLY except within the
    image's own top/bottom 2 rows (edge-pad policy differs there)."""
    rng = np.random.default_rng(1)
    k1 = jnp.asarray(rng.normal(size=(3, 3, 1, 4), scale=0.5)
                     .astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(3, 3, 4, 2), scale=0.5)
                     .astype(np.float32))

    def apply_fn(x):
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.tanh(y)
        return jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    img = jnp.asarray(rng.normal(size=(64, 48, 1)).astype(np.float32))
    dense = np.asarray(apply_fn(img[None]))[0]
    pred = make_spatial_sharded_predictor(apply_fn, mesh, halo=4)
    out = np.asarray(pred(img))
    assert out.shape == dense.shape
    np.testing.assert_allclose(out[2:-2], dense[2:-2], atol=1e-5)


def test_halo_zero_is_bandwise_forward(mesh):
    """halo=0 applies the model independently per band (no comms)."""
    img = jnp.ones((16, 8, 1), jnp.float32)
    pred = make_spatial_sharded_predictor(lambda x: x + 1.0, mesh, halo=0)
    np.testing.assert_allclose(np.asarray(pred(img)), 2.0, atol=1e-6)


def test_uneven_rows_raises(mesh):
    pred = make_spatial_sharded_predictor(lambda x: x, mesh, halo=0)
    with pytest.raises(ValueError, match="divide evenly"):
        pred(jnp.zeros((30, 8, 1)))


def test_halo_exceeding_band_raises(mesh):
    """halo > per-device band height would silently clamp the neighbor
    slices and mis-crop (round-5 review) — must refuse instead."""
    pred = make_spatial_sharded_predictor(lambda x: x, mesh, halo=32)
    with pytest.raises(ValueError, match="band height"):
        pred(jnp.zeros((128, 8, 1)))  # 16-row bands < halo 32


def test_lowering_uses_neighbor_permute_not_allgather(mesh):
    """The comm pattern must be nearest-neighbor (collective-permute of
    halo rows), NOT an all-gather of the full image."""
    pred = make_spatial_sharded_predictor(lambda x: x * 2.0, mesh, halo=4)
    # jit(predict) contains a device_put; lower the shard_map body path
    # via the public predictor on an abstract value
    txt = jax.jit(pred).lower(
        jax.ShapeDtypeStruct((64, 40, 1), jnp.float32)).as_text()
    assert "collective_permute" in txt or "collective-permute" in txt
    assert "all_gather" not in txt and "all-gather" not in txt


def test_real_model_spatial_predict(mesh):
    """Flagship-architecture model (tiny input): spatial_predict returns
    calibrated probabilities of the right shape and matches the
    single-device halo-tiled prediction where both are exact (interior
    agreement is architecture-level, not pinned numerically — the two
    paths split the image differently; shape/finite/range checks here,
    exactness pinned by the conv tests above)."""
    from segtpu.models import UNetWithBackbone, create_model_state
    from segtpu.parallel import spatial_predict
    from segtpu.train.engine import TrainState

    m = UNetWithBackbone(backbone="resnet34", use_attention=False)
    params, bs = create_model_state(m, jax.random.key(0), (1, 64, 64, 1))
    state = TrainState(params=params, batch_stats=bs, opt_state=None)
    # 256 rows / 8 devices = 32-row bands + 2·16 halo = 64 ✓ stride-32
    img = np.random.default_rng(2).random((256, 64)).astype(np.float32)
    probs = spatial_predict(m, state, img, mesh, halo=16)
    assert probs.shape == (256, 64, 1)
    assert np.isfinite(probs).all()
    assert probs.min() >= 0.0 and probs.max() <= 1.0
