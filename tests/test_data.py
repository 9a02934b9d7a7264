"""Data layer tests: discovery contract, preprocessing parity vs the
reference's cv2 chain, loader batching, and augmentation invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.data import (
    load_original_data,
    make_synthetic_dataset,
    decode_gray,
    prepare_data,
    CellSegmentationDataset,
    CellAugmenter,
    AUGMENTATION_CANDIDATES,
    build_pipeline,
)
from segtpu.data.preprocess import load_canonical, normalize_microscopy_image
from segtpu.data.augment import augment_batch


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), n_images=8, image_type="W")


def test_discovery_contract(dataset_dir):
    data = load_original_data(dataset_dir, image_type="W")
    assert len(data["image_paths"]) == 8
    assert len(data["mask_paths"]) == 8
    for ip, mp in zip(data["image_paths"], data["mask_paths"]):
        assert mp.endswith("_GT.tif")
        assert ip.endswith(".tif") and "_GT" not in ip
    # modality filter: no 'B' images exist
    none = load_original_data(dataset_dir, image_type="B")
    assert len(none["image_paths"]) == 0


def test_discovery_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_original_data(str(tmp_path / "nope"))


def test_normalize_matches_reference_chain(dataset_dir):
    """Full preprocessing parity vs the cv2 implementation of
    dataset.py:30-66 (resize INTER_AREA → percentile clip → CLAHE →
    min-max)."""
    cv2 = pytest.importorskip("cv2")
    data = load_original_data(dataset_dir, image_type="W")
    ip = data["image_paths"][0]
    raw = decode_gray(ip)

    # reference chain
    ref = cv2.resize(raw, (128, 128), interpolation=cv2.INTER_AREA)
    p_low, p_high = np.percentile(ref, [2, 98])
    ref_c = np.clip(ref, p_low, p_high)
    c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    ref_e = c.apply(ref_c.astype(np.uint8))
    ref_n = (ref_e - ref_e.min()) / (ref_e.max() - ref_e.min() + 1e-8)

    # ours
    ci, _ = load_canonical([ip], [data["mask_paths"][0]], (128, 128))
    ours = np.asarray(normalize_microscopy_image(jnp.asarray(ci[0])))

    # canonical uint8 resize may differ ±1 from cv2's fixed point; the
    # normalized outputs must agree closely.
    assert np.abs(ours - ref_n).max() < 0.05
    assert np.abs(ours - ref_n).mean() < 0.005


def test_mask_binarization(dataset_dir):
    data = load_original_data(dataset_dir, image_type="W")
    ds = CellSegmentationDataset(data["image_paths"], data["mask_paths"],
                                 img_size=(64, 64))
    imgs, masks = ds.materialize()
    assert imgs.shape == (8, 64, 64, 1)
    assert masks.shape == (8, 64, 64, 1)
    u = np.unique(np.asarray(masks))
    assert set(u.tolist()) <= {0.0, 1.0}
    assert imgs.dtype == jnp.float32
    assert float(jnp.min(imgs)) >= 0.0 and float(jnp.max(imgs)) <= 1.0


def test_loader_batching(dataset_dir):
    data = load_original_data(dataset_dir, image_type="W")
    loader = prepare_data(data["image_paths"], data["mask_paths"],
                          batch_size=3, img_size=(64, 64), shuffle=True)
    assert len(loader) == 3  # 8 samples, bs 3 → 2 full + remainder
    (fi, fm), rem = loader.batches(jax.random.key(0))
    assert fi.shape == (2, 3, 64, 64, 1)
    assert rem[0].shape == (2, 64, 64, 1)
    # iteration covers every sample exactly once
    seen = sum(b[0].shape[0] for b in loader)
    assert seen == 8


def test_all_candidates_run_and_are_valid(rng):
    img = jnp.asarray(rng.integers(0, 256, (64, 64)).astype(np.float32))
    mask = jnp.asarray((rng.random((64, 64)) > 0.6).astype(np.float32) * 255)
    key = jax.random.key(1)
    for name, fn in AUGMENTATION_CANDIDATES.items():
        ai, am = fn((img, mask), key)
        assert ai.shape == (64, 64), name
        assert am.shape == (64, 64), name
        assert np.isfinite(np.asarray(ai)).all(), name
        a = np.asarray(ai)
        assert a.min() >= -1e-3 and a.max() <= 255.001, name


def test_geometric_transforms_move_mask_with_image(rng):
    """Joint image/mask transformation: a geometric warp must displace both
    identically (mask-aware contract, SURVEY.md §2.3)."""
    img = np.zeros((64, 64), np.float32)
    img[10:20, 30:40] = 200.0
    mask = (img > 0).astype(np.float32) * 255
    key = jax.random.key(3)
    for name in ["horizontal_flip", "vertical_flip", "transpose",
                 "random_rotate_90", "affine", "random_crop", "crop_and_pad"]:
        fn = AUGMENTATION_CANDIDATES[name]
        ai, am = fn((jnp.asarray(img), jnp.asarray(mask)), key)
        ai, am = np.asarray(ai), np.asarray(am)
        bright = ai > 50
        fg = am > 127
        if fg.sum() == 0:
            continue
        overlap = (bright & fg).sum() / max(fg.sum(), 1)
        assert overlap > 0.8, f"{name}: mask/image misaligned ({overlap:.2f})"


def test_intensity_transforms_leave_mask_untouched(rng):
    img = jnp.asarray(rng.integers(0, 256, (32, 32)).astype(np.float32))
    mask = jnp.asarray((rng.random((32, 32)) > 0.5).astype(np.float32) * 255)
    key = jax.random.key(7)
    for name in ["gauss_noise", "invert", "solarize", "random_gamma",
                 "color_jitter", "advanced_blur", "downscale",
                 "coarse_dropout", "grid_dropout"]:
        _, am = AUGMENTATION_CANDIDATES[name]((img, mask), key)
        assert np.array_equal(np.asarray(am), np.asarray(mask)), name


def test_deterministic_given_key(rng):
    img = jnp.asarray(rng.integers(0, 256, (32, 32)).astype(np.float32))
    mask = jnp.zeros((32, 32), jnp.float32)
    pipe = build_pipeline(["affine", "gauss_noise"], for_selection=True)
    a1 = np.asarray(pipe((img, mask), jax.random.key(5))[0])
    a2 = np.asarray(pipe((img, mask), jax.random.key(5))[0])
    a3 = np.asarray(pipe((img, mask), jax.random.key(6))[0])
    assert np.array_equal(a1, a2)
    assert not np.array_equal(a1, a3)


def test_cell_augmenter_expands_dataset(rng):
    imgs = rng.integers(0, 256, (4, 32, 32)).astype(np.uint8)
    masks = (rng.random((4, 32, 32)) > 0.5).astype(np.uint8)
    aug = CellAugmenter(augmentations_per_image=3, seed=0)
    ai, am = aug.augment_training_data(imgs, masks)
    assert ai.shape == (16, 32, 32)
    assert am.shape == (16, 32, 32)
    # originals preserved at the front (dataset.py:167-169)
    assert np.array_equal(np.asarray(ai[:4]), imgs)
    assert set(np.unique(np.asarray(am)).tolist()) <= {0, 1}
    # zero-augmentation passthrough (dataset.py:161-162)
    aug0 = CellAugmenter(augmentations_per_image=0)
    bi, bm = aug0.augment_training_data(imgs, masks)
    assert bi.shape == (4, 32, 32)


def test_production_pipeline_produces_diversity(rng):
    imgs = np.tile(rng.integers(0, 256, (1, 64, 64)).astype(np.uint8), (1, 1, 1))
    masks = np.zeros((1, 64, 64), np.uint8)
    aug = CellAugmenter(augmentations_per_image=8, seed=1)
    ai, _ = aug.augment_training_data(imgs, masks)
    copies = np.asarray(ai[1:])
    # at least some of the 8 copies must differ from each other
    diffs = sum(not np.array_equal(copies[i], copies[j])
                for i in range(8) for j in range(i + 1, 8))
    assert diffs > 10


def test_16bit_dim_tiff_scales_by_bit_depth(tmp_path):
    """A dim 16-bit TIFF must decode like cv2.IMREAD_GRAYSCALE: always
    /256, never data-dependent (ADVICE r1; dataset.py:46 semantics)."""
    from PIL import Image
    from segtpu.data.io import decode_gray

    # all values < 256 in 16-bit → cv2 would map them all to 0
    dim = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 3)
    p = tmp_path / "dim16.tif"
    Image.fromarray(dim, mode="I;16").save(p)
    arr = decode_gray(str(p))
    assert arr.dtype == np.uint8
    assert arr.max() == 0  # 189/256 -> 0

    bright = dim * 256
    p2 = tmp_path / "bright16.tif"
    Image.fromarray(bright.astype(np.uint16), mode="I;16").save(p2)
    arr2 = decode_gray(str(p2))
    np.testing.assert_array_equal(arr2, (bright / 256).astype(np.uint8))


def test_load_canonical_images_matches_pair_loader(dataset_dir):
    """Images-only loader == image half of the pair loader."""
    from segtpu.data import load_original_data
    from segtpu.data.preprocess import load_canonical, load_canonical_images

    data = load_original_data(str(dataset_dir), image_type="W")
    ci, _ = load_canonical(data["image_paths"], data["mask_paths"], (32, 32))
    ci2 = load_canonical_images(data["image_paths"], (32, 32))
    np.testing.assert_array_equal(ci, ci2)


def test_load_canonical_chunked_matches_single_shot(tmp_path):
    """The double-buffered chunked pipeline must be byte-identical to the
    single-shot path, incl. mixed raw shapes straddling chunk boundaries
    and the raw-shape side output."""
    from PIL import Image

    from segtpu.data.io import clear_decode_cache
    from segtpu.data.preprocess import load_canonical

    rng = np.random.default_rng(7)
    shapes = [(40, 56), (40, 56), (64, 48), (40, 56), (64, 48), (96, 80),
              (40, 56)]
    imgs, masks = [], []
    for i, (h, w) in enumerate(shapes):
        im = rng.integers(0, 255, (h, w), dtype=np.uint8)
        mk = (im > 127).astype(np.uint8) * 255
        pi, pm = str(tmp_path / f"i{i}.tif"), str(tmp_path / f"i{i}_GT.tif")
        Image.fromarray(im).save(pi)
        Image.fromarray(mk).save(pm)
        imgs.append(pi)
        masks.append(pm)

    clear_decode_cache()
    ci0, cm0, rs0 = load_canonical(imgs, masks, (32, 32),
                                   return_raw_shapes=True, chunk=None)
    clear_decode_cache()
    ci1, cm1, rs1 = load_canonical(imgs, masks, (32, 32),
                                   return_raw_shapes=True, chunk=2)
    np.testing.assert_array_equal(ci0, ci1)
    np.testing.assert_array_equal(cm0, cm1)
    np.testing.assert_array_equal(rs0, rs1)
    np.testing.assert_array_equal(rs0, np.array(shapes))


def test_pipelined_loader_consumer_failure_unblocks_producer(tmp_path,
                                                             monkeypatch):
    """If the consumer raises mid-stream (e.g. a resize/device error), the
    producer thread — possibly blocked on the full 2-slot queue — must be
    drained and joined before the exception propagates, not leaked with
    its in-flight decode buffers (ADVICE r3)."""
    import threading
    import time

    from PIL import Image

    from segtpu.data import preprocess as P
    from segtpu.data.io import clear_decode_cache

    rng = np.random.default_rng(3)
    imgs = []
    for i in range(8):
        im = rng.integers(0, 255, (40, 40), dtype=np.uint8)
        p = str(tmp_path / f"i{i}.tif")
        Image.fromarray(im).save(p)
        imgs.append(p)

    def boom(shape, size):
        raise RuntimeError("injected resize failure")

    monkeypatch.setattr(P, "_resize_img_fn", boom)
    clear_decode_cache()
    before = {t.name for t in threading.enumerate()}
    with pytest.raises(RuntimeError, match="injected resize failure"):
        P._decode_resize_pipelined(imgs, None, (32, 32), chunk=1)
    # the prefetch thread must be gone (drained + exited), promptly
    deadline = time.time() + 10
    while time.time() < deadline:
        leaked = {t.name for t in threading.enumerate()} - before
        if not any("segtpu-decode-prefetch" in n for n in leaked):
            break
        time.sleep(0.05)
    leaked = {t.name for t in threading.enumerate()} - before
    assert not any("segtpu-decode-prefetch" in n for n in leaked), leaked
