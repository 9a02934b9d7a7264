"""Statistical behavior of the augmentation engine: probability gating,
production probability rules, transform effect distributions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.data.augment import (
    AUGMENTATION_CANDIDATES,
    build_pipeline,
    production_probability,
    t_affine,
    t_random_rotate_90,
)


def test_production_probability_rules():
    """forward_selection_integration.py:255-264 parity."""
    assert production_probability("horizontal_flip") == 0.5
    assert production_probability("vertical_flip") == 0.5
    assert production_probability("random_rotate_90") == 0.3
    assert production_probability("transpose") == 0.3
    assert production_probability("affine") == 0.3
    assert production_probability("gauss_noise") == 0.3


def test_selection_gate_rate():
    """In selection mode every transform applies with p=0.7
    (forward_selection_integration.py:254-255)."""
    img = jnp.zeros((16, 16)).at[4:8, 4:8].set(200.0)
    mask = jnp.zeros((16, 16))
    pipe = build_pipeline(["invert"], for_selection=True)
    n = 300
    applied = 0
    for i in range(n):
        out, _ = pipe((img, mask), jax.random.key(i))
        if float(out[0, 0]) > 100:  # inverted background becomes 255
            applied += 1
    rate = applied / n
    assert 0.6 < rate < 0.8, rate   # ~0.7


def test_production_gate_rate():
    img = jnp.zeros((16, 16)).at[4:8, 4:8].set(200.0)
    mask = jnp.zeros((16, 16))
    pipe = build_pipeline(["invert"], for_selection=False)  # p=0.3
    n = 300
    applied = sum(
        float(pipe((img, mask), jax.random.key(i))[0][0, 0]) > 100
        for i in range(n))
    rate = applied / n
    assert 0.2 < rate < 0.4, rate


def test_rotate90_uniform_k():
    """RandomRotate90 samples k∈{0,1,2,3} ≈ uniformly."""
    img = jnp.zeros((8, 8)).at[0, :].set(1.0)  # top edge marker
    mask = jnp.zeros((8, 8))
    counts = {0: 0, 1: 0, 2: 0, 3: 0}
    for i in range(400):
        out, _ = t_random_rotate_90((img, mask), jax.random.key(i))
        o = np.asarray(out)
        if o[0, :].sum() > 7:
            counts[0] += 1
        elif o[:, 0].sum() > 7:
            counts[1] += 1
        elif o[-1, :].sum() > 7:
            counts[2] += 1
        else:
            counts[3] += 1
    for k, c in counts.items():
        assert 60 < c < 140, (k, counts)


def test_affine_stays_near_identity():
    """Affine ranges (scale .95-1.05, translate ±5%, rotate ±15°) keep most
    mass in place for a centered blob."""
    img = jnp.zeros((64, 64)).at[24:40, 24:40].set(255.0)
    mask = img
    overlaps = []
    for i in range(30):
        ai, am = t_affine((img, mask), jax.random.key(i), border="reflect")
        a = np.asarray(am) > 127
        ref = np.asarray(mask) > 127
        inter = (a & ref).sum()
        union = (a | ref).sum()
        overlaps.append(inter / max(union, 1))
    assert np.mean(overlaps) > 0.6, np.mean(overlaps)


def test_mask_stays_binary_through_all_geometric_candidates(rng):
    img = jnp.asarray(rng.integers(0, 256, (64, 64)).astype(np.float32))
    mask = jnp.asarray((rng.random((64, 64)) > 0.5).astype(np.float32) * 255)
    for name in ("affine", "grid_distortion", "optical_distortion",
                 "random_crop", "crop_and_pad"):
        _, am = AUGMENTATION_CANDIDATES[name]((img, mask),
                                              jax.random.key(11))
        vals = np.unique(np.asarray(am))
        # nearest-sampled from {0, 255} (+ 0 border) → stays in {0, 255}
        assert set(vals.tolist()).issubset({0.0, 255.0}), (name, vals)


def test_tiled_sample_matmul_matches_single_shot(rng, monkeypatch):
    """Above _MATMUL_PIX_LIMIT the resampler tiles the contraction over
    pixel blocks (bounded HBM at flagship canonical sizes, ADVICE r3);
    the tiled path must be numerically identical to the whole-frame
    two-matmul form — same taps, same weights, just chunked."""
    from segtpu.data import augment as A

    img = jnp.asarray(rng.uniform(0, 1, (48, 40)), jnp.float32)
    ys = jnp.asarray(rng.uniform(-5, 52, (48, 40)), jnp.float32)
    xs = jnp.asarray(rng.uniform(-5, 44, (48, 40)), jnp.float32)

    for border in ("reflect", "constant"):
        for fn in (A.sample_bilinear, A.sample_nearest):
            whole = fn(img, ys, xs, border)
            # force tiling with a non-divisible block size (pad path)
            monkeypatch.setattr(A, "_MATMUL_PIX_LIMIT", 100)
            monkeypatch.setattr(A, "_MATMUL_BLOCK", 128)
            tiled = fn(img, ys, xs, border)
            monkeypatch.undo()
            np.testing.assert_allclose(np.asarray(tiled),
                                       np.asarray(whole), atol=1e-6)
            assert tiled.shape == ys.shape
