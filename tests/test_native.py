"""Native C++ TIFF decoder parity vs PIL (native/segtpu_io.cc)."""

import os

import numpy as np
import pytest

from segtpu.data.native import (
    native_available,
    native_decode_gray,
    native_decode_batch,
)


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable (no g++?)")


@pytest.fixture
def tiffs(tmp_path, rng):
    from PIL import Image
    out = []
    for i, (h, w) in enumerate([(37, 53), (128, 128), (300, 200)]):
        a = rng.integers(0, 256, (h, w), np.uint8)
        p = str(tmp_path / f"t{i}.tif")
        Image.fromarray(a).save(p)
        out.append((p, a))
    return out


def test_native_decode_matches_pil(tiffs):
    for p, a in tiffs:
        d = native_decode_gray(p)
        assert d is not None
        assert np.array_equal(d, a)


def test_native_batch_decode(tiffs):
    batch = native_decode_batch([p for p, _ in tiffs], n_threads=2)
    for b, (_, a) in zip(batch, tiffs):
        assert b is not None and np.array_equal(b, a)


def test_native_rejects_unsupported(tmp_path, rng):
    from PIL import Image
    a = rng.integers(0, 256, (16, 16, 3), np.uint8)  # RGB → unsupported
    p = str(tmp_path / "rgb.tif")
    Image.fromarray(a).save(p)
    assert native_decode_gray(p) is None  # graceful fallback signal


def test_decode_gray_integration(tmp_path, rng):
    """segtpu.data.io.decode_gray uses the native path transparently."""
    from PIL import Image
    from segtpu.data.io import decode_gray, clear_decode_cache
    a = rng.integers(0, 256, (64, 48), np.uint8)
    p = str(tmp_path / "x.tif")
    Image.fromarray(a).save(p)
    clear_decode_cache()
    assert np.array_equal(decode_gray(p), a)
