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


def _torchvision_style_resnet34_sd(rng):
    """Random state_dict with torchvision resnet34 names/shapes (the
    pretrained=True input, advanced_models.py:73-88)."""
    import torch as T
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = T.from_numpy(
            rng.normal(0, 0.05, (o, i, k, k)).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = T.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[name + ".bias"] = T.from_numpy(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[name + ".running_mean"] = T.from_numpy(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[name + ".running_var"] = T.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = (64, 128, 256, 512)
    counts = (3, 4, 6, 3)
    cin = 64
    for li, (wd, n) in enumerate(zip(widths, counts)):
        for bi in range(n):
            p = f"layer{li+1}.{bi}"
            stride_in = cin if bi == 0 else wd
            conv(f"{p}.conv1", wd, stride_in, 3)
            bn(f"{p}.bn1", wd)
            conv(f"{p}.conv2", wd, wd, 3)
            bn(f"{p}.bn2", wd)
            if bi == 0 and (li > 0):
                conv(f"{p}.downsample.0", wd, cin, 1)
                bn(f"{p}.downsample.1", wd)
        cin = wd
    return sd


def test_torchvision_encoder_overlay(rng):
    """pretrained=True path: torchvision resnet34 weights overlay onto the
    encoder subtree with the RGB→gray first-conv sum; decoder keeps its
    fresh init; forward runs."""
    from segtpu.models import UNetWithBackbone, create_model_state
    from segtpu.models.torch_convert import (
        load_torchvision_encoder, merge_encoder, jax_tree_to_py)

    sd = _torchvision_style_resnet34_sd(rng)
    ep, es = load_torchvision_encoder(sd, "resnet34")

    m = UNetWithBackbone(backbone="resnet34", use_attention=False)
    params, stats = create_model_state(m, jax.random.key(0), (1, 32, 32, 1))
    params = jax_tree_to_py(params)
    stats = jax_tree_to_py(stats)
    merged_p, merged_s = merge_encoder(params, stats, ep, es)

    # first conv = channel-sum of the RGB kernel
    got = np.asarray(merged_p["encoder"]["input_conv"]["kernel"])
    want = sd["conv1.weight"].numpy().sum(1, keepdims=True)
    np.testing.assert_allclose(got, np.transpose(want, (2, 3, 1, 0)),
                               atol=1e-6)
    # running stats copied
    np.testing.assert_allclose(
        np.asarray(merged_s["encoder"]["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy(), atol=1e-6)
    # decoder untouched by the overlay
    np.testing.assert_allclose(
        np.asarray(merged_p["conv_final"]["kernel"]),
        np.asarray(params["conv_final"]["kernel"]))

    out = m.apply({"params": jax.tree.map(jnp.asarray, merged_p),
                   "batch_stats": jax.tree.map(jnp.asarray, merged_s)},
                  jnp.ones((1, 32, 32, 1)), train=False)
    assert np.isfinite(np.asarray(out)).all()


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
