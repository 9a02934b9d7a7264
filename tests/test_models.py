"""Model tests: shapes, gradients, attention variants, parameter counts,
feature extraction — for all 3 backbones (SURVEY.md §4c).

Compile budget: this box has one CPU core, so the heavyweight backbones
(resnet50 / densenet121) are validated structurally with ``jax.eval_shape``
(full trace, zero XLA compile) and only resnet34 runs real compiled
forward/backward passes. ``--run-slow`` enables full compiles for all."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.models import UNetWithBackbone, create_model_state

BACKBONES = ["resnet34", "resnet50", "densenet121"]


def _abstract_init_apply(backbone, use_attention, hw=32):
    """Trace init+apply without compiling; returns (param_count, out_shape)."""
    m = UNetWithBackbone(backbone=backbone, use_attention=use_attention)
    x = jax.ShapeDtypeStruct((2, hw, hw, 1), jnp.float32)
    variables = jax.eval_shape(
        lambda: m.init(jax.random.key(0), jnp.zeros((2, hw, hw, 1)),
                       train=False))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    out = jax.eval_shape(
        lambda v, x: m.apply(v, x, train=False), variables, x)
    return n_params, out.shape


@pytest.mark.parametrize("backbone", BACKBONES)
@pytest.mark.parametrize("use_attention", [True, False])
def test_shapes_all_variants_traced(backbone, use_attention):
    """Structural validation (channel plumbing, crops, attention wiring)
    for every backbone × attention combo — trace-only, no compile."""
    n_params, out_shape = _abstract_init_apply(backbone, use_attention)
    assert out_shape == (2, 32, 32, 1)
    assert n_params > 1e6


def test_param_count_resnet34_attention():
    """Same parameter budget as the reference model (~24.4M for
    resnet34 + attention; guards against gross architecture drift)."""
    n, _ = _abstract_init_apply("resnet34", True)
    assert 24.0e6 < n < 25.0e6, n


def test_param_counts_touch_torchvision_scale():
    """resnet50 (~23.5M encoder) and densenet121 (~7M encoder) based U-Nets
    land in the expected ranges."""
    n50, _ = _abstract_init_apply("resnet50", False)
    nd, _ = _abstract_init_apply("densenet121", False)
    assert 40e6 < n50 < 80e6, n50   # resnet50 U-Net (wide decoder)
    assert 9e6 < nd < 25e6, nd      # densenet121 U-Net


def test_encoder_feature_channels_traced():
    """x1..x5 channel dims and strides match advanced_models.py:84-155."""
    from segtpu.models.backbones import make_encoder, BACKBONE_CHANNELS
    for backbone in BACKBONES:
        enc = make_encoder(backbone)
        x = jnp.zeros((1, 64, 64, 1))
        variables = jax.eval_shape(
            lambda: enc.init(jax.random.key(0), x, False))
        feats = jax.eval_shape(
            lambda v: enc.apply(v, x, False), variables)
        chans = tuple(f.shape[-1] for f in feats)
        assert chans == BACKBONE_CHANNELS[backbone], (backbone, chans)
        strides = tuple(64 // f.shape[1] for f in feats)
        assert strides == (2, 4, 8, 16, 32), (backbone, strides)


def test_odd_input_size_crop_handling():
    """Non-power-of-two inputs engage the center-crop paths
    (advanced_models.py:317-347) — trace-only."""
    for hw in (96, 160):
        _, out_shape = _abstract_init_apply("resnet34", False, hw=hw)
        assert out_shape == (2, hw, hw, 1)


def test_return_features_traced():
    m = UNetWithBackbone(backbone="resnet34", use_attention=False)
    x = jnp.zeros((1, 32, 32, 1))
    variables = jax.eval_shape(
        lambda: m.init(jax.random.key(0), x, train=False))
    out, feats = jax.eval_shape(
        lambda v: m.apply(v, x, train=False, return_features=True),
        variables)
    assert out.shape == (1, 32, 32, 1)
    # x2 (64ch upsampled) + x3 (128ch) at x3's stride-8 resolution
    assert feats.shape == (1, 4, 4, 192)


# ---------------------------------------------------------- compiled tests

@pytest.fixture(scope="module")
def r34_state():
    m = UNetWithBackbone(backbone="resnet34", use_attention=True)
    params, bs = create_model_state(m, jax.random.key(0), (1, 32, 32, 1))
    return m, params, bs


def test_forward_runs_and_finite(r34_state):
    m, params, bs = r34_state
    fwd = jax.jit(lambda p, b, x: m.apply(
        {"params": p, "batch_stats": b}, x, train=False))
    out = fwd(params, bs, jnp.ones((2, 32, 32, 1)))
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_train_mode_updates_batch_stats(r34_state):
    m, params, bs = r34_state
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 1)),
                    jnp.float32)
    step = jax.jit(lambda p, b, x: m.apply(
        {"params": p, "batch_stats": b}, x, train=True,
        mutable=["batch_stats"]))
    out, mut = step(params, bs, x)
    before = jax.tree.leaves(bs)
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_gradients_flow(r34_state):
    m, params, bs = r34_state
    x = jnp.ones((1, 32, 32, 1))
    t = jnp.zeros((1, 32, 32, 1))

    @jax.jit
    def loss_fn(p):
        out, _ = m.apply({"params": p, "batch_stats": bs}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.mean((jax.nn.sigmoid(out) - t) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.5


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["resnet50", "densenet121"])
def test_full_compile_big_backbones(backbone):
    m = UNetWithBackbone(backbone=backbone, use_attention=True)
    params, bs = create_model_state(m, jax.random.key(0), (1, 32, 32, 1))
    fwd = jax.jit(lambda p, b, x: m.apply(
        {"params": p, "batch_stats": b}, x, train=False))
    out = fwd(params, bs, jnp.zeros((2, 32, 32, 1)))
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_head_fusion_parity():
    """fuse_head contracts upconv0∘conv_final into one transposed conv;
    outputs must match the unfused two-op head to fp tightness, and the
    param tree must be identical (checkpoint compatibility)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from segtpu.models import UNetWithBackbone, create_model_state

    kw = dict(backbone="resnet_tiny", use_attention=False)
    m_fused = UNetWithBackbone(**kw, fuse_head=True)
    m_plain = UNetWithBackbone(**kw, fuse_head=False)
    params, bs = create_model_state(m_fused, jax.random.key(0),
                                    (1, 64, 64, 1))
    p2, bs2 = create_model_state(m_plain, jax.random.key(0), (1, 64, 64, 1))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 1), jnp.float32)
    y_fused = m_fused.apply({"params": params, "batch_stats": bs}, x,
                            train=False)
    y_plain = m_plain.apply({"params": params, "batch_stats": bs}, x,
                            train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               atol=1e-5, rtol=1e-5)


def test_stem_s2d_parity():
    """The space-to-depth stem reparameterization must match the plain
    7x7/s2 stem to fp tightness (same params, exact weight transform)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from segtpu.models.backbones import make_encoder

    enc_s2d = make_encoder("resnet_tiny")
    v = enc_s2d.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)),
                     train=False)
    import dataclasses
    enc_plain = dataclasses.replace(enc_s2d, stem_s2d=False)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 1), jnp.float32)
    a = enc_s2d.apply(v, x, train=False)
    b = enc_plain.apply(v, x, train=False)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   atol=2e-5, rtol=2e-5)
    # odd spatial size falls back to the plain path (no crash)
    x_odd = jax.random.normal(jax.random.key(2), (1, 63, 63, 1))
    v2 = enc_s2d.init(jax.random.key(0), x_odd, train=False)
    _ = enc_s2d.apply(v2, x_odd, train=False)
