"""Pallas-fused decoder path (``fuse='pallas'``) vs the XLA parity path.

The fused path routes the non-attention decoder's upsample+skip-concat
through ``upsample2x_concat_pallas`` (measured 0.49× XLA time at 128→256
decoder shapes — PERF.md); these tests pin (a) param-tree identity between
fused and unfused models, (b) forward parity, and (c) that the custom
``_UpConv2x`` module is init- and output-identical to the
``nn.ConvTranspose`` it replaced (so pre-existing checkpoints still load).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from segtpu.models.unet import UNetWithBackbone, _UpConv2x


def test_upconv2x_matches_convtranspose(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    m_ref = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID")
    m_new = _UpConv2x(6)
    k = jax.random.key(7)
    v_ref = m_ref.init(k, x)
    v_new = m_new.init(k, x)
    for p in ("kernel", "bias"):
        np.testing.assert_array_equal(np.asarray(v_ref["params"][p]),
                                      np.asarray(v_new["params"][p]))
    np.testing.assert_allclose(np.asarray(m_ref.apply(v_ref, x)),
                               np.asarray(m_new.apply(v_new, x)), rtol=1e-6)


def test_fused_param_tree_identical_and_forward_parity(rng):
    k = jax.random.key(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 1)).astype(np.float32))
    m0 = UNetWithBackbone(backbone="resnet34", use_attention=False)
    m1 = UNetWithBackbone(backbone="resnet34", use_attention=False,
                          fuse="pallas", fuse_min_cin=0, fuse_min_work=0)
    v0 = m0.init(k, x, train=False)
    v1 = m1.init(k, x, train=False)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), v0, v1))
    y0 = m0.apply(v0, x, train=False)
    y1 = m1.apply(v1, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


def test_fused_train_mode_falls_back_to_xla(rng):
    """train=True must never hit the Pallas kernel (no VJP defined):
    gradients of the fused model must exist and equal the unfused model's."""
    k = jax.random.key(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)).astype(np.float32))
    m1 = UNetWithBackbone(backbone="resnet34", use_attention=False,
                          fuse="pallas", fuse_min_cin=0, fuse_min_work=0)
    v1 = m1.init(k, x, train=True)

    def loss(params):
        y, _ = m1.apply({"params": params, "batch_stats": v1["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(v1["params"])
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_fuse_config_reaches_engine():
    from segtpu.train.engine import get_engine
    eng = get_engine({"backbone": "resnet34", "use_attention": False,
                      "fuse": "pallas", "loss_fn": "combo"})
    assert eng.model.fuse == "pallas"
