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


def test_native_decode_lzw_and_packbits(tmp_path, rng):
    """LZW (comp 5) and PackBits (comp 32773) strip TIFFs decode natively
    (native/segtpu_io.cc lzw_decode/packbits_decode)."""
    from PIL import Image
    smooth = (np.cumsum(rng.integers(-2, 3, (200, 300)), axis=1)
              % 256).astype(np.uint8)
    noisy = rng.integers(0, 256, (64, 96), np.uint8)
    for comp in ("tiff_lzw", "packbits"):
        for j, a in enumerate((smooth, noisy)):
            p = str(tmp_path / f"{comp}_{j}.tif")
            Image.fromarray(a).save(p, compression=comp)
            d = native_decode_gray(p)
            assert d is not None, (comp, j)
            assert np.array_equal(d, a), (comp, j)


def _write_tiff_predictor2(path, arr, little=True):
    """Minimal uncompressed strip TIFF with horizontal-differencing
    predictor (tag 317 == 2)."""
    import struct
    h, w = arr.shape
    d = arr.astype(np.int16)
    d[:, 1:] = d[:, 1:] - d[:, :-1]
    data = (d % 256).astype(np.uint8).tobytes()
    bo = "<" if little else ">"
    hdr = (b"II" if little else b"MM") + struct.pack(bo + "H", 42) \
        + struct.pack(bo + "I", 8)

    def tag(t, typ, cnt, val):
        head = struct.pack(bo + "HHI", t, typ, cnt)
        if typ == 3:  # SHORT lives in the FIRST 2 bytes of the value field
            return head + struct.pack(bo + "H", val) + b"\x00\x00"
        return head + struct.pack(bo + "I", val)

    ntags = 9
    data_off = 8 + 2 + ntags * 12 + 4
    tags = (tag(256, 3, 1, w) + tag(257, 3, 1, h) + tag(258, 3, 1, 8)
            + tag(259, 3, 1, 1) + tag(262, 3, 1, 1)
            + tag(273, 4, 1, data_off) + tag(278, 3, 1, h)
            + tag(279, 4, 1, len(data)) + tag(317, 3, 1, 2))
    import struct as _s
    ifd = _s.pack(bo + "H", ntags) + tags + _s.pack(bo + "I", 0)
    with open(path, "wb") as f:
        f.write(hdr + ifd + data)


@pytest.mark.parametrize("little", [True, False])
def test_native_decode_predictor2(tmp_path, rng, little):
    a = rng.integers(0, 256, (40, 60), np.uint8)
    p = str(tmp_path / f"pred2_{little}.tif")
    _write_tiff_predictor2(p, a, little)
    d = native_decode_gray(p)
    assert d is not None
    assert np.array_equal(d, a)


def test_load_canonical_uses_batch_decode(tmp_path, rng):
    """load_canonical round-trips LZW-compressed pairs through the native
    batch decoder."""
    from PIL import Image
    from segtpu.data.io import clear_decode_cache
    from segtpu.data.preprocess import load_canonical
    imgs, masks = [], []
    for i in range(3):
        a = rng.integers(0, 256, (80, 100), np.uint8)
        m = (rng.uniform(size=(80, 100)) > 0.6).astype(np.uint8) * 255
        ip = str(tmp_path / f"i{i}.tif")
        mp = str(tmp_path / f"i{i}_GT.tif")
        Image.fromarray(a).save(ip, compression="tiff_lzw")
        Image.fromarray(m).save(mp, compression="packbits")
        imgs.append(ip)
        masks.append(mp)
    clear_decode_cache()
    ci, cm, raw = load_canonical(imgs, masks, (64, 64),
                                 return_raw_shapes=True)
    assert ci.shape == (3, 64, 64) and cm.shape == (3, 64, 64)
    assert (raw == [80, 100]).all()
    assert set(np.unique(cm)) <= {0, 1}


def test_truncated_strip_rejected(tmp_path):
    """A truncated uncompressed TIFF must be rejected by the native
    decoder (PIL fallback handles or errors), never silently produce
    garbage rows or read past the mapped file."""
    from segtpu.data.native import native_available, native_decode_gray
    if not native_available():
        pytest.skip("native lib unavailable")
    import numpy as np
    arr = (np.arange(64 * 64) % 251).astype(np.uint8).reshape(64, 64)
    p = str(tmp_path / "t.tif")
    from PIL import Image
    Image.fromarray(arr).save(p, compression=None)
    full = open(p, "rb").read()
    # PIL writes the IFD at the end; truncating pixel data while keeping
    # the header intact requires the strip to precede the IFD — instead,
    # lie in StripByteCounts by shrinking the file is fiddly, so emulate:
    # chop the file so the declared strip extends past EOF.
    open(p, "wb").write(full[: len(full) - 16])
    out = native_decode_gray(p)
    assert out is None  # rejected, not garbage


def test_huge_dims_rejected(tmp_path):
    """Header-declared absurd dimensions are a clean rejection (no
    multi-GB allocation)."""
    from segtpu.data.native import native_available, native_probe
    if not native_available():
        pytest.skip("native lib unavailable")
    import struct
    # Minimal little-endian TIFF header: IFD with width=height=100000,
    # bits=8, comp=1, spp=1, one strip.
    def entry(tag, typ, cnt, val):
        return struct.pack("<HHII", tag, typ, cnt, val)
    ifd = b"".join([
        entry(256, 4, 1, 100000), entry(257, 4, 1, 100000),
        entry(258, 3, 1, 8), entry(259, 3, 1, 1),
        entry(273, 4, 1, 8), entry(277, 3, 1, 1),
        entry(279, 4, 1, 0xFFFFFFF0),
    ])
    data = struct.pack("<2sHI", b"II", 42, 16) + b"\0" * 8 + \
        struct.pack("<H", 7) + ifd + struct.pack("<I", 0)
    p = str(tmp_path / "huge.tif")
    open(p, "wb").write(data)
    assert native_probe(p) is None


def test_batch_decode_chunked_under_budget(tiffs, monkeypatch):
    """The aggregate output buffer is bounded: with a budget smaller than
    the batch total the decode splits into chunks and still returns every
    image intact (ADVICE r2: unbounded sum of header-declared sizes)."""
    import segtpu.data.native as native_mod
    monkeypatch.setattr(native_mod, "_BATCH_BUDGET_BYTES", 20000)
    batch = native_mod.native_decode_batch([p for p, _ in tiffs],
                                           n_threads=2)
    for b, (_, a) in zip(batch, tiffs):
        assert b is not None and np.array_equal(b, a)
