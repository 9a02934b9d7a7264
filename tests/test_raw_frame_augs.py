"""Raw-frame augmentation semantics (VERDICT round-1 item #4).

The reference applies ``random_crop``'s 96² and ``downscale``'s factor to
the RAW image before the dataset resize (forward_selection_integration.py:
168-172 + dataset.py:50). These tests pin the folded-into-canonical
equivalents: a 96² crop of a 512² raw image must behave as a ~5.3× zoom of
the canonical frame, and a 0.5× downscale of a large raw image must be a
near-no-op after the resize to the canonical size.
"""

import numpy as np

import jax
import jax.numpy as jnp

from segtpu.data.augment import (
    RAW_FRAME_AWARE, augment_batch, build_pipeline, t_downscale,
    t_random_crop)

S = 128


def _gradient_pair():
    img = jnp.tile(jnp.arange(S, dtype=jnp.float32)[None, :], (S, 1))
    mask = jnp.zeros((S, S), jnp.float32)
    return img, mask


def test_raw_crop_is_strong_zoom():
    """96² of a 512² raw = a 24-px canonical window blown up to 128²: the
    output must span ~24 gradient values, not ~96."""
    pair = _gradient_pair()
    out_raw, _ = t_random_crop(pair, jax.random.key(0), crop=96,
                               raw_hw=jnp.asarray([512.0, 512.0]))
    out_can, _ = t_random_crop(pair, jax.random.key(0), crop=96)
    span_raw = float(out_raw.max() - out_raw.min())
    span_can = float(out_can.max() - out_can.min())
    expected_raw = (S - 1) * (96 * S / 512) / S      # ≈ 23.8
    expected_can = (S - 1) * 96 / S                  # ≈ 95.3
    assert abs(span_raw - expected_raw) < 2.0, (span_raw, expected_raw)
    assert abs(span_can - expected_can) < 2.0, (span_can, expected_can)


def test_raw_crop_identity_when_raw_equals_crop():
    """Raw image of exactly 96²: the crop covers the whole field, so the
    canonical frame is (nearly) unchanged."""
    pair = _gradient_pair()
    out, _ = t_random_crop(pair, jax.random.key(1), crop=96,
                           raw_hw=jnp.asarray([96.0, 96.0]))
    assert float(jnp.max(jnp.abs(out - pair[0]))) < 1.0


def test_raw_downscale_nearly_noop_for_large_raw():
    """Downscaling a 2048² raw by 0.5 leaves ≥1024 samples across the
    field — far above the 128 canonical samples — so after the dataset
    resize the transform is nearly invisible (sub-pixel jitter only).
    The canonical-frame version at the same factor is a strong blur."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (S, S)).astype(np.float32))
    mask = jnp.zeros((S, S), jnp.float32)
    out_raw, _ = t_downscale((img, mask), jax.random.key(2),
                             raw_hw=jnp.asarray([2048.0, 2048.0]))
    out_can, _ = t_downscale((img, mask), jax.random.key(2))
    diff_raw = float(jnp.mean(jnp.abs(out_raw - img)))
    diff_can = float(jnp.mean(jnp.abs(out_can - img)))
    assert diff_raw < 5.0, diff_raw
    assert diff_can > 5 * diff_raw, (diff_can, diff_raw)


def test_registry_marks_raw_aware():
    assert RAW_FRAME_AWARE == {"random_crop", "downscale"}


def test_augment_batch_raw_hw_plumbing():
    """augment_batch(raw_hw=...) reaches the transforms: with a huge raw
    shape the 96² crop is a ~34× zoom, which must differ from the
    canonical-mode output for the same key."""
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (3, S, S), np.uint8)
    masks = (rng.uniform(size=(3, S, S)) > 0.7).astype(np.uint8)
    pipe = build_pipeline(["random_crop"], for_selection=True)
    raw_hw = np.asarray([[4096, 4096]] * 3, np.int32)
    ai, am = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                           jax.random.key(3), pipe, copies=2, raw_hw=raw_hw)
    bi, bm = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                           jax.random.key(3), pipe, copies=2)
    assert ai.shape == (6, S, S) and am.shape == (6, S, S)
    assert not np.array_equal(np.asarray(ai), np.asarray(bi))


def test_load_canonical_returns_raw_shapes(tmp_path):
    from segtpu.data.discovery import load_original_data
    from segtpu.data.io import make_synthetic_dataset
    from segtpu.data.preprocess import load_canonical
    make_synthetic_dataset(str(tmp_path), n_images=3, image_type="W")
    d = load_original_data(str(tmp_path), image_type="W")
    ci, cm, raw = load_canonical(d["image_paths"], d["mask_paths"],
                                 (64, 64), return_raw_shapes=True)
    assert raw.shape == (len(d["image_paths"]), 2)
    assert (raw > 0).all()


def test_augment_batch_raw_hw_requires_pipeline():
    """raw_hw with a bare callable must raise, not silently fall back to
    canonical-frame semantics (ADVICE r2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from segtpu.data.augment import augment_batch

    imgs = jnp.zeros((2, 16, 16), jnp.uint8)
    masks = jnp.zeros((2, 16, 16), jnp.uint8)
    with pytest.raises(ValueError, match="raw_hw requires a Pipeline"):
        augment_batch(imgs, masks, jax.random.key(0),
                      lambda pair, k: pair, copies=1,
                      raw_hw=np.full((2, 2), 32.0))
