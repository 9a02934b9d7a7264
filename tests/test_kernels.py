"""Pallas kernel correctness vs XLA references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from segtpu.kernels.fused_conv import (
    conv3x3_bn_relu_pallas,
    conv3x3_bn_relu_xla,
    upsample2x_concat_pallas,
    upsample2x_concat_xla,
    fold_bn,
)


@pytest.fixture
def interp():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_conv3x3_bn_relu_matches_xla(rng, interp):
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    ref = conv3x3_bn_relu_xla(x, w, scale, bias)
    got = conv3x3_bn_relu_pallas(x, w, scale, bias, tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_upsample_concat_matches_xla(rng, interp):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 8, 12)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 32, 32, 4)).astype(np.float32))
    ref = upsample2x_concat_xla(x, w, b, skip)
    got = upsample2x_concat_pallas(x, w, b, skip, tile=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv_pair_matches_xla(rng, interp):
    """Fused decoder block (double conv in VMEM) vs XLA, incl. border
    zero-masking of the intermediate."""
    from segtpu.kernels.fused_block import (
        conv_pair_bn_relu_pallas, conv_pair_bn_relu_xla)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=16).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=16).astype(np.float32))
    ref = conv_pair_bn_relu_xla(x, w1, s1, b1, w2, s2, b2)
    got = conv_pair_bn_relu_pallas(x, w1, s1, b1, w2, s2, b2, tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fold_bn_equivalence(rng):
    """conv → BN(inference) == conv with folded weights."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.5, 1.5, 6).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 6).astype(np.float32))

    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = sc * (conv(x, w) + b - mean) / jnp.sqrt(var + 1e-5) + sh
    wf, bf = fold_bn(w, b, sc, sh, mean, var)
    got = conv(x, wf) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_attention_gate_fused_matches_composition(rng):
    """One-pass Pallas gate == the plain jnp composition (interpret mode
    engages automatically off-TPU)."""
    from segtpu.kernels.attention_gate import attention_gate_fused

    cg, cx, f = 8, 12, 8
    g = jnp.asarray(rng.normal(size=(2, 8, 16, cg)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8, 16, cx)).astype(np.float32))
    ag = jnp.asarray(rng.normal(size=(cg, f)).astype(np.float32) * 0.3)
    ax = jnp.asarray(rng.normal(size=(cx, f)).astype(np.float32) * 0.3)
    bh = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
    ap = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
    bp = jnp.float32(0.17)

    h = jnp.maximum(g @ ag + x @ ax + bh, 0.0)
    p = h @ ap[:, None] + bp
    ref = x * jax.nn.sigmoid(p)
    got = attention_gate_fused(g, x, ag, ax, bh, ap, bp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_attention_gate_module_fused_parity(rng):
    """AttentionGate(fused=True) == unfused module at inference, with
    non-trivial BN running stats, and the param/batch_stats trees are
    identical."""
    from segtpu.models.attention import AttentionGate

    gate = AttentionGate(f_int=8)
    g = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    v0 = gate.init(jax.random.key(0), g, x, train=False, fused=False)
    v1 = gate.init(jax.random.key(0), g, x, train=False, fused=True)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # randomize params + running stats to exercise the BN fold
    leaves, treedef = jax.tree.flatten(v0)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    leaves = [jnp.abs(jax.random.normal(k, l.shape, l.dtype)) + 0.1
              for k, l in zip(keys, leaves)]
    v = jax.tree.unflatten(treedef, leaves)

    ref = gate.apply(v, g, x, train=False, fused=False)
    got = gate.apply(v, g, x, train=False, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_unet_fuse_gate_model_parity(rng):
    """Whole-model inference parity: fuse_gate=True vs False (resnet_tiny,
    attention on), shared variables."""
    from segtpu.models.unet import UNetWithBackbone

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 1)).astype(np.float32))
    m0 = UNetWithBackbone(backbone="resnet_tiny", use_attention=True,
                          fuse_gate=False)
    m1 = UNetWithBackbone(backbone="resnet_tiny", use_attention=True,
                          fuse_gate=True)
    v = m0.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(
        m1.init(jax.random.key(0), x, train=False))
    ref = m0.apply(v, x, train=False)
    got = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
