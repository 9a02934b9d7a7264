"""Weight-conversion parity: a reference-style torch UNet checkpoint
converted to Flax must produce the same eval-mode outputs
(SURVEY.md §7 hard part 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_conv_layouts():
    from segtpu.models.torch_convert import conv_kernel, conv_transpose_kernel
    import torch.nn as nn
    import flax.linen as fnn

    # plain conv parity
    c = nn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(1, 3, 8, 8)
    with torch.no_grad():
        ref = c(x).numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    m = fnn.Conv(5, (3, 3), padding=1)
    out = m.apply({"params": {
        "kernel": jnp.asarray(conv_kernel(c.weight)),
        "bias": jnp.asarray(c.bias.detach().numpy())}}, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, atol=1e-5)

    # transposed conv parity (2×2 stride-2, the decoder upsample)
    t = nn.ConvTranspose2d(2, 3, 2, stride=2)
    x = torch.randn(1, 2, 4, 4)
    with torch.no_grad():
        ref = t(x).numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    mt = fnn.ConvTranspose(3, (2, 2), strides=(2, 2), padding="VALID")
    out = mt.apply({"params": {
        "kernel": jnp.asarray(conv_transpose_kernel(t.weight)),
        "bias": jnp.asarray(t.bias.detach().numpy())}}, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, atol=1e-5)


def test_grayscale_sum():
    from segtpu.models.torch_convert import grayscale_sum
    w = torch.randn(64, 3, 7, 7)
    g = grayscale_sum(w)
    assert g.shape == (64, 1, 7, 7)
    np.testing.assert_allclose(g[:, 0], w.sum(1).numpy(), atol=1e-6)


@pytest.mark.parametrize("use_attention", [False, True])
def test_reference_checkpoint_forward_parity(use_attention):
    """Full-model conversion: random reference-style torch model (eval
    mode, BN running stats) vs converted Flax model on the same input."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from torch_baseline import build_model
    from segtpu.models import UNetWithBackbone
    from segtpu.models.torch_convert import load_reference_checkpoint

    tm = build_model(use_attention=use_attention).eval()
    # randomize BN running stats so the test actually checks them
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)

    x = torch.randn(2, 1, 64, 64)
    with torch.no_grad():
        ref = tm(x).numpy()

    params, stats = load_reference_checkpoint(
        tm.state_dict(), backbone="resnet34", use_attention=use_attention)
    model = UNetWithBackbone(backbone="resnet34", use_attention=use_attention)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = model.apply({"params": jax.tree.map(jnp.asarray, params),
                       "batch_stats": jax.tree.map(jnp.asarray, stats)},
                      xj, train=False)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=2e-4)
