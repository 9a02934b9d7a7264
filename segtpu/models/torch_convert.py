"""torch/torchvision checkpoint → Flax parameter conversion.

The reference builds its encoders from pretrained torchvision models and
adapts the first conv to grayscale by summing the RGB kernel
(advanced_models.py:73-139). This container has no network access and no
torchvision, so pretrained weights must come from a user-supplied local
checkpoint; this module converts them:

- ``load_torchvision_encoder``: a torchvision ``resnet34``/``resnet50``/
  ``densenet121`` state_dict → our encoder params/batch_stats, including
  the RGB→grayscale first-conv channel sum.
- ``load_reference_checkpoint``: a full reference-style ``UNetWithBackbone``
  state_dict (advanced_models.py module naming: ``input_conv``, ``enc1``…,
  ``upconv4``, ``decoder4.0``…, ``attention4.W_g.0``…,
  ``ch_attention4.fc.0``…) → complete params/batch_stats for our model.

Layout conversions (verified against torch in tests/test_convert.py):
- Conv2d weight (O, I, kh, kw) → (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw) → spatial flip → (kh, kw, I, O)
  (torch's transposed conv is the gradient of a conv, i.e. a flipped-kernel
  fractionally-strided conv; flax's ConvTranspose does not flip)
- BatchNorm weight/bias → scale/bias (params); running_mean/var →
  mean/var (batch_stats)
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def conv_transpose_kernel(w) -> np.ndarray:
    w = _np(w)
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def grayscale_sum(w) -> np.ndarray:
    """RGB first-conv → 1-channel by summing over the input-channel dim
    (advanced_models.py:76-78)."""
    w = _np(w)
    return w.sum(axis=1, keepdims=True)


class _TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def _set(self, root, path, value):
        d = root
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = np.ascontiguousarray(value)

    def conv(self, path, sd, key, bias=True, transform=conv_kernel):
        self._set(self.params, path + ("kernel",), transform(sd[key + ".weight"]))
        if bias and key + ".bias" in sd:
            self._set(self.params, path + ("bias",), _np(sd[key + ".bias"]))

    def conv_t(self, path, sd, key):
        self._set(self.params, path + ("kernel",),
                  conv_transpose_kernel(sd[key + ".weight"]))
        if key + ".bias" in sd:
            self._set(self.params, path + ("bias",), _np(sd[key + ".bias"]))

    def bn(self, path, sd, key):
        self._set(self.params, path + ("scale",), _np(sd[key + ".weight"]))
        self._set(self.params, path + ("bias",), _np(sd[key + ".bias"]))
        self._set(self.stats, path + ("mean",), _np(sd[key + ".running_mean"]))
        self._set(self.stats, path + ("var",), _np(sd[key + ".running_var"]))


_RESNET_BLOCKS = {"resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3)}


def _convert_resnet_encoder(b: _TreeBuilder, sd: Dict, backbone: str,
                            prefix: str, layer_name: str,
                            grayscale: bool) -> None:
    enc = ("encoder",)
    first = conv_kernel(grayscale_sum(sd[prefix + "conv1.weight"])) \
        if grayscale else conv_kernel(sd[prefix + "conv1.weight"])
    b._set(b.params, enc + ("input_conv", "kernel"), first)
    b.bn(enc + ("bn1",), sd, prefix + "bn1")
    bottleneck = backbone == "resnet50"
    for li, n in enumerate(_RESNET_BLOCKS[backbone]):
        for bi in range(n):
            tk = f"{prefix}{layer_name}{li+1}.{bi}"
            fp = enc + (f"layer{li+1}_{bi}",)
            convs = ("conv1", "conv2", "conv3") if bottleneck else \
                ("conv1", "conv2")
            for c in convs:
                b.conv(fp + (c,), sd, f"{tk}.{c}", bias=False)
                b.bn(fp + (c.replace("conv", "bn"),), sd,
                     f"{tk}.{c.replace('conv', 'bn')}")
            if f"{tk}.downsample.0.weight" in sd:
                b.conv(fp + ("down_conv",), sd, f"{tk}.downsample.0",
                       bias=False)
                b.bn(fp + ("down_bn",), sd, f"{tk}.downsample.1")


def _convert_densenet_encoder(b: _TreeBuilder, sd: Dict,
                              grayscale: bool,
                              include_stem: bool = True) -> None:
    enc = ("encoder",)
    if include_stem:
        first = conv_kernel(grayscale_sum(sd["features.conv0.weight"])) \
            if grayscale else conv_kernel(sd["features.conv0.weight"])
        b._set(b.params, enc + ("input_conv", "kernel"), first)
    b.bn(enc + ("norm0",), sd, "features.norm0")
    for bi, n_layers in enumerate((6, 12, 24, 16)):
        blk = enc + (f"denseblock{bi+1}",)
        for li in range(n_layers):
            tk = f"features.denseblock{bi+1}.denselayer{li+1}"
            fp = blk + (f"denselayer{li+1}",)
            b.bn(fp + ("norm1",), sd, f"{tk}.norm1")
            b.conv(fp + ("conv1",), sd, f"{tk}.conv1", bias=False)
            b.bn(fp + ("norm2",), sd, f"{tk}.norm2")
            b.conv(fp + ("conv2",), sd, f"{tk}.conv2", bias=False)
        if bi < 3:
            tk = f"features.transition{bi+1}"
            fp = enc + (f"transition{bi+1}",)
            b.bn(fp + ("norm",), sd, f"{tk}.norm")
            b.conv(fp + ("conv",), sd, f"{tk}.conv", bias=False)


def load_torchvision_encoder(sd: Dict, backbone: str,
                             grayscale: bool = True
                             ) -> Tuple[Dict, Dict]:
    """Convert a torchvision classifier state_dict into the encoder subtree
    (params, batch_stats). Merge into full model params with
    ``merge_encoder``."""
    b = _TreeBuilder()
    if backbone in _RESNET_BLOCKS:
        _convert_resnet_encoder(b, sd, backbone, "", "layer", grayscale)
    elif backbone == "densenet121":
        _convert_densenet_encoder(b, sd, grayscale)
    else:
        raise ValueError(backbone)
    return b.params, b.stats


def load_reference_checkpoint(sd: Dict, backbone: str = "resnet34",
                              use_attention: bool = True
                              ) -> Tuple[Dict, Dict]:
    """Convert a full reference-style UNetWithBackbone state_dict
    (advanced_models.py naming) into (params, batch_stats) for
    ``segtpu.models.UNetWithBackbone``."""
    b = _TreeBuilder()
    # encoder (already grayscale in a trained reference checkpoint)
    if backbone in _RESNET_BLOCKS:
        b._set(b.params, ("encoder", "input_conv", "kernel"),
               conv_kernel(sd["input_conv.weight"]))
        b.bn(("encoder", "bn1"), sd, "bn1")
        bottleneck = backbone == "resnet50"
        for li, n in enumerate(_RESNET_BLOCKS[backbone]):
            for bi in range(n):
                tk = f"enc{li+1}.{bi}"
                fp = ("encoder", f"layer{li+1}_{bi}")
                convs = ("conv1", "conv2", "conv3") if bottleneck else \
                    ("conv1", "conv2")
                for c in convs:
                    b.conv(fp + (c,), sd, f"{tk}.{c}", bias=False)
                    b.bn(fp + (c.replace("conv", "bn"),), sd,
                         f"{tk}.{c.replace('conv', 'bn')}")
                if f"{tk}.downsample.0.weight" in sd:
                    b.conv(fp + ("down_conv",), sd, f"{tk}.downsample.0",
                           bias=False)
                    b.bn(fp + ("down_bn",), sd, f"{tk}.downsample.1")
    elif backbone == "densenet121":
        # The trained grayscale stem lives in 'input_conv.weight'
        # (advanced_models.py:136-139); the state_dict ALSO carries the
        # unused 3-channel 'features.conv0.weight', which must not
        # overwrite it (include_stem=False skips it).
        b._set(b.params, ("encoder", "input_conv", "kernel"),
               conv_kernel(sd["input_conv.weight"]))
        if "features.norm0.weight" in sd:
            _convert_densenet_encoder(b, sd, grayscale=False,
                                      include_stem=False)

    # decoder
    for lvl in (4, 3, 2, 1):
        b.conv_t(("upconv%d" % lvl,), sd, f"upconv{lvl}")
        dp = (f"decoder{lvl}",)
        b.conv(dp + ("conv1",), sd, f"decoder{lvl}.0")
        b.bn(dp + ("bn1",), sd, f"decoder{lvl}.1")
        b.conv(dp + ("conv2",), sd, f"decoder{lvl}.3")
        b.bn(dp + ("bn2",), sd, f"decoder{lvl}.4")
        if use_attention:
            ap = (f"attention{lvl}",)
            b.conv(ap + ("W_g",), sd, f"attention{lvl}.W_g.0")
            b.bn(ap + ("BatchNorm_0",), sd, f"attention{lvl}.W_g.1")
            b.conv(ap + ("W_x",), sd, f"attention{lvl}.W_x.0")
            b.bn(ap + ("BatchNorm_1",), sd, f"attention{lvl}.W_x.1")
            b.conv(ap + ("psi",), sd, f"attention{lvl}.psi.0")
            b.bn(ap + ("BatchNorm_2",), sd, f"attention{lvl}.psi.1")
            cp = (f"ch_attention{lvl}",)
            b.conv(cp + ("fc1",), sd, f"ch_attention{lvl}.fc.0", bias=False)
            b.conv(cp + ("fc2",), sd, f"ch_attention{lvl}.fc.2", bias=False)
    b.conv_t(("upconv0",), sd, "upconv0")
    b.conv(("conv_final",), sd, "conv_final")
    return b.params, b.stats


def merge_encoder(params: Dict, batch_stats: Dict, enc_params: Dict,
                  enc_stats: Dict) -> Tuple[Dict, Dict]:
    """Overlay converted encoder weights onto freshly initialized model
    variables (the ``pretrained=True`` path)."""

    def overlay(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = overlay(out[k], v)
            else:
                out[k] = v
        return out

    return overlay(params, enc_params), overlay(batch_stats, enc_stats)


def resolve_encoder_checkpoint(ckpt, backbone: str):
    """``config["encoder_checkpoint"]`` is either one path (used whatever
    the backbone) or a ``{backbone: path}`` mapping for multi-backbone
    experiment grids (the BASELINE.md model-configuration protocol trains
    resnet34 AND resnet50 configs, each needing its own torchvision
    checkpoint). A mapping with no entry for this backbone resolves to
    None → fresh init for that config."""
    if isinstance(ckpt, dict):
        return ckpt.get(backbone)
    return ckpt


def load_pretrained(model, rng, input_shape, checkpoint_path: str,
                    kind: str = "torchvision") -> Tuple[Dict, Dict]:
    """Initialize a model and overlay pretrained weights from a local torch
    checkpoint file (``torch.save``'d state_dict).

    kind='torchvision': encoder-only overlay with grayscale first-conv sum
    (the reference's pretrained=True behavior).
    kind='reference': full reference UNetWithBackbone state_dict.
    """
    import torch

    from segtpu.models.unet import create_model_state

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = create_model_state(model, rng, input_shape)
    params = jax_tree_to_py(params)
    stats = jax_tree_to_py(stats)
    if kind == "torchvision":
        ep, es = load_torchvision_encoder(sd, model.backbone)
        params, stats = merge_encoder(params, stats, ep, es)
    else:
        ep, es = load_reference_checkpoint(sd, model.backbone,
                                           model.use_attention)
        params, stats = merge_encoder(params, stats, ep, es)
    import jax.numpy as jnp
    import jax
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)
    return to_dev(params), to_dev(stats)


def jax_tree_to_py(tree):
    """Unfreeze/clone a flax variable tree into plain nested dicts."""
    if isinstance(tree, dict) or type(tree).__name__ == "FrozenDict":
        return {k: jax_tree_to_py(v) for k, v in tree.items()}
    return tree
