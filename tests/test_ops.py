"""Parity tests for the low-level image ops vs OpenCV / scipy."""

import numpy as np
import pytest

import jax.numpy as jnp

from segtpu.ops.resize import resize_area, resize_nearest, resize_bilinear
from segtpu.ops.clahe import clahe
from segtpu.ops.edt import distance_transform_edt

cv2 = pytest.importorskip("cv2")
from scipy import ndimage


@pytest.mark.parametrize("shape,out", [((512, 640), (128, 128)),
                                       ((256, 256), (128, 128)),
                                       ((200, 300), (96, 96))])
def test_resize_area_matches_cv2_downscale(rng, shape, out):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_AREA)
    ours = np.floor(np.clip(np.array(resize_area(jnp.asarray(img), out)), 0, 255) + 0.5)
    # identical up to ±1 from cv2's fixed-point accumulation
    assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1


@pytest.mark.parametrize("shape,out", [((512, 640), (128, 128)),
                                       ((300, 200), (256, 256)),
                                       ((77, 131), (64, 64))])
def test_resize_nearest_matches_cv2(rng, shape, out):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_NEAREST)
    ours = np.array(resize_nearest(jnp.asarray(img), out))
    assert np.array_equal(ref, ours)


def test_resize_bilinear_matches_torch_interpolate(rng):
    """Exact parity with F.interpolate(mode='bilinear',
    align_corners=False) — the reference's feature-fusion resize
    (advanced_models.py:354)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF
    img = rng.normal(size=(24, 40)).astype(np.float32)
    ref = TF.interpolate(torch.from_numpy(img)[None, None], size=(37, 64),
                         mode="bilinear", align_corners=False)[0, 0].numpy()
    ours = np.array(resize_bilinear(jnp.asarray(img), (37, 64)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_bilinear_half_pixel(rng):
    # torch align_corners=False convention: compare to cv2 INTER_LINEAR
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = cv2.resize(img, (128, 128), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    ours = np.array(resize_bilinear(jnp.asarray(img), (128, 128)))
    assert np.abs(ref - ours).max() <= 1.0


@pytest.mark.parametrize("shape", [(128, 128), (256, 256), (64, 64)])
def test_clahe_bit_exact_divisible(rng, shape):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    ours = np.array(clahe(jnp.asarray(img)))
    assert np.array_equal(ref, ours)


def test_clahe_nondivisible_close(rng):
    img = rng.integers(0, 256, (100, 130), dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    ours = np.array(clahe(jnp.asarray(img)))
    assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1


def test_clahe_realistic_lowcontrast(rng):
    base = (rng.normal(120, 10, (128, 128))).clip(0, 255).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(base)
    ours = np.array(clahe(jnp.asarray(base)))
    assert np.array_equal(ref, ours)


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9])
def test_edt_matches_scipy(rng, p):
    img = (rng.random((96, 128)) > p).astype(np.float32)
    ref = ndimage.distance_transform_edt(img)
    ours = np.array(distance_transform_edt(jnp.asarray(img)))
    np.testing.assert_allclose(ref, ours, atol=1e-4)


def test_edt_no_background_matches_scipy_quirk():
    img = np.ones((17, 23), np.float32)
    ref = ndimage.distance_transform_edt(img)
    ours = np.array(distance_transform_edt(jnp.asarray(img)))
    np.testing.assert_allclose(ref, ours, atol=1e-4)
