"""Tiled inference tests: blending exactness and model-path sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.infer.tiled import make_tiled_predictor, _blend_window, _tile_origins


def test_blend_window_partition_of_unity():
    tile, overlap = 64, 16
    w = _blend_window(tile, overlap)
    stride = tile - overlap
    # Two windows offset by the stride must sum to 1 in the overlap region
    # (checked along the interior row to isolate the 1-D ramp).
    col = w[tile // 2, :overlap] + w[tile // 2, stride:]
    np.testing.assert_allclose(col, 1.0, atol=1e-6)


def test_tile_origins_cover():
    for size, tile, stride in [(100, 64, 48), (512, 128, 96), (64, 64, 48)]:
        org = _tile_origins(size, tile, stride)
        covered = np.zeros(size, bool)
        for o in org:
            covered[o:o + tile] = True
        assert covered.all()
        assert org[-1] + tile <= size


def test_tiled_identity_function_exact():
    """With apply_fn = 2x identity, tiled output must equal 2·input
    everywhere — validates extraction, blending and normalization."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(200, 168, 1)).astype(np.float32))

    predictor = make_tiled_predictor(lambda x: x * 2.0, tile=64, overlap=16,
                                     batch_tiles=4)
    out = np.asarray(predictor(img))
    np.testing.assert_allclose(out, np.asarray(img) * 2.0, atol=1e-5)


def test_tiled_multichannel_output():
    """apply_fn changing channel count (1 → 3)."""
    img = jnp.ones((96, 96, 1), jnp.float32)

    def apply_fn(x):
        return jnp.concatenate([x, x * 2, x * 3], axis=-1)

    predictor = make_tiled_predictor(apply_fn, tile=64, overlap=16,
                                     batch_tiles=2)
    out = np.asarray(predictor(img))
    assert out.shape == (96, 96, 3)
    np.testing.assert_allclose(out[..., 2], 3.0, atol=1e-5)


def test_tiled_predict_many_matches_single(rng):
    """Stream-batched tiled inference == per-image tiled inference."""
    from segtpu.infer.tiled import make_tiled_predictor_many
    imgs = jnp.asarray(rng.normal(size=(3, 96, 96, 1)).astype(np.float32))

    def f(x):
        return jnp.tanh(x * 1.3 + 0.2)

    single = make_tiled_predictor(f, tile=32, overlap=8, batch_tiles=4)
    many = make_tiled_predictor_many(f, tile=32, overlap=8, batch_tiles=4)
    ref = np.stack([np.asarray(single(im)) for im in imgs])
    got = np.asarray(many(imgs))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_tiled_with_real_model():
    from segtpu.models import UNetWithBackbone, create_model_state
    from segtpu.infer.tiled import tiled_predict
    from segtpu.train.engine import TrainState

    m = UNetWithBackbone(backbone="resnet34", use_attention=False)
    params, bs = create_model_state(m, jax.random.key(0), (1, 64, 64, 1))
    state = TrainState(params=params, batch_stats=bs, opt_state=None)
    img = np.random.default_rng(1).random((160, 160)).astype(np.float32)
    probs = tiled_predict(m, state, img, tile=64, overlap=16, batch_tiles=2)
    assert probs.shape == (160, 160, 1)
    assert np.isfinite(probs).all()
    assert probs.min() >= 0.0 and probs.max() <= 1.0


def test_tiled_halo_identity_exact():
    """Halo mode, apply_fn = 2x identity: exact everywhere, including
    non-tile-multiple sizes (grid pads right/bottom, crops back)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(100, 88, 1)).astype(np.float32))
    pred = make_tiled_predictor(lambda x: x * 2.0, tile=32, overlap=16,
                                batch_tiles=4, mode="halo")
    out = np.asarray(pred(img))
    assert out.shape == (100, 88, 1)
    np.testing.assert_allclose(out, np.asarray(img) * 2.0, atol=1e-5)


def test_tiled_halo_matches_dense_for_small_receptive_field():
    """A 2-layer 3×3 conv stack has receptive radius 2 ≤ halo 4, so halo
    tiling must reproduce the dense forward EXACTLY on every pixel ≥2
    from the image border (border pixels differ only by pad policy:
    dense SAME zero-pads, the tiler reflect-pads)."""
    rng = np.random.default_rng(4)
    k1 = jnp.asarray(rng.normal(size=(3, 3, 1, 4), scale=0.5).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(3, 3, 4, 2), scale=0.5).astype(np.float32))

    def apply_fn(x):
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.tanh(y)
        return jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    img = jnp.asarray(rng.normal(size=(96, 96, 1)).astype(np.float32))
    dense = np.asarray(apply_fn(img[None]))[0]
    pred = make_tiled_predictor(apply_fn, tile=32, overlap=8,
                                batch_tiles=4, mode="halo")
    out = np.asarray(pred(img))
    assert out.shape == dense.shape
    np.testing.assert_allclose(out[2:-2, 2:-2], dense[2:-2, 2:-2], atol=1e-5)


def test_tiled_halo_predict_many_matches_single(rng):
    from segtpu.infer.tiled import make_tiled_predictor_many
    imgs = jnp.asarray(rng.normal(size=(3, 96, 96, 1)).astype(np.float32))

    def f(x):
        return jnp.tanh(x * 1.3 + 0.2)

    # batch_tiles=4 → scatter-scan assembly; 32 → one-forward
    # transpose/reshape fast path — both must survive predict_many's vmap
    for bt in (4, 32):
        single = make_tiled_predictor(f, tile=32, overlap=8,
                                      batch_tiles=bt, mode="halo")
        many = make_tiled_predictor_many(f, tile=32, overlap=8,
                                         batch_tiles=bt, mode="halo")
        ref = np.stack([np.asarray(single(im)) for im in imgs])
        got = np.asarray(many(imgs))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_tiled_halo_reshape_path_matches_scan_path(rng):
    """batch_tiles large enough for one forward takes the transpose/
    reshape assembly; smaller batch_tiles takes the scatter scan — both
    must agree exactly."""
    img = jnp.asarray(rng.normal(size=(128, 96, 1)).astype(np.float32))

    def f(x):
        return jnp.tanh(x * 1.3 + 0.2)

    one_shot = make_tiled_predictor(f, tile=32, overlap=8, batch_tiles=32,
                                    mode="halo")   # 12 tiles, 1 batch
    scanned = make_tiled_predictor(f, tile=32, overlap=8, batch_tiles=4,
                                   mode="halo")    # 3 batches via scan
    np.testing.assert_allclose(np.asarray(one_shot(img)),
                               np.asarray(scanned(img)), atol=1e-6)


def test_tiled_auto_batch_tiles_matches_explicit(rng):
    """batch_tiles=None auto-sizes to min(n_tiles, 32): identical output
    to an explicit cap in both modes (and, in halo mode, routes ≤32-tile
    images to the scan-free reshape assembly)."""
    img = jnp.asarray(rng.normal(size=(128, 96, 1)).astype(np.float32))

    def f(x):
        return jnp.tanh(x * 1.3 + 0.2)

    for mode in ("blend", "halo"):
        auto = make_tiled_predictor(f, tile=32, overlap=8, mode=mode)
        explicit = make_tiled_predictor(f, tile=32, overlap=8,
                                        batch_tiles=4, mode=mode)
        np.testing.assert_allclose(np.asarray(auto(img)),
                                   np.asarray(explicit(img)), atol=1e-5)


def test_tiled_auto_batch_cap_bounds_memory(rng):
    """Above 32 tiles the auto batch still scans (cap, not one forward):
    a 288×288 image at tile 32 has 81 tiles in blend mode — the result
    must match a small explicit batch exactly."""
    img = jnp.asarray(rng.normal(size=(288, 288, 1)).astype(np.float32))

    def f(x):
        return x * 0.5 + 0.1

    auto = make_tiled_predictor(f, tile=32, overlap=8, mode="blend")
    explicit = make_tiled_predictor(f, tile=32, overlap=8, batch_tiles=8,
                                    mode="blend")
    np.testing.assert_allclose(np.asarray(auto(img)),
                               np.asarray(explicit(img)), atol=1e-5)


def test_tiled_bad_mode_raises():
    with pytest.raises(ValueError, match="mode"):
        make_tiled_predictor(lambda x: x, mode="bogus")


def test_tiled_small_image_pads_edge():
    """Images smaller than ~half the tile can't reflect-pad; the predictor
    must fall back to edge padding instead of raising (ADVICE r1)."""
    from segtpu.infer.tiled import make_tiled_predictor

    pred = make_tiled_predictor(lambda x: x, tile=64, overlap=16)
    img = jnp.arange(20 * 20, dtype=jnp.float32).reshape(20, 20, 1) / 400.0
    out = pred(img)
    assert out.shape == (20, 20, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
