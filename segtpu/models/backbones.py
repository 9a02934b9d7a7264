"""Encoder backbones: ResNet-34/50 and DenseNet-121, NHWC Flax.

These mirror the torchvision architectures the reference wraps
(advanced_models.py:72-155, 207-262) — same stage structure, channel dims
and feature-extraction points — implemented natively for TPU: NHWC layout,
BN with mutable batch stats, all convs MXU-shaped. The grayscale first conv
(1→64, 7×7/2) lives here; pretrained RGB weights are adapted by channel-sum
in the torchvision-checkpoint converter (segtpu/models/torch_convert.py),
matching advanced_models.py:76-78.

Returns the 5 skip features (x1..x5) at strides /2, /4, /8, /16, /32.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvParams(nn.Module):
    """Parameter-only leaf: declares the exact (kernel[, bias]) of the
    ``nn.Conv``/``nn.ConvTranspose`` it replaces — same names, shapes,
    initializers and param_dtype — and returns them for call-site math.
    Lets callers reparameterize an op (head fusion, s2d stem) while the
    param tree (and checkpoints) stay bit-identical to the plain-module
    form."""
    kernel_size: Sequence[int]
    features: int
    use_bias: bool = True
    bias_init: Any = None

    @nn.compact
    def __call__(self, in_features: int):
        from flax.linen.linear import default_kernel_init
        kernel = self.param(
            "kernel", default_kernel_init,
            (*self.kernel_size, in_features, self.features), jnp.float32)
        if not self.use_bias:
            return kernel
        bias = self.param(
            "bias",
            self.bias_init if self.bias_init is not None
            else nn.initializers.zeros_init(),
            (self.features,), jnp.float32)
        return kernel, bias


def _stem_s2d_map() -> "np.ndarray":
    """Constant mapping M (7,7,4,4,4): the exact reparameterization of a
    7×7/s2 Cin=1 conv kernel into the equivalent 4×4/s1 kernel over the
    2×2 space-to-depth input (phase channel p = 2·du+dv, conv padding
    (2,1)): w4[a,b,p,c] = Σ_{u,v} M[u,v,a,b,p] · w7[u,v,0,c]."""
    import numpy as np
    m = np.zeros((7, 7, 4, 4, 4), np.float32)
    for u in range(7):
        for v in range(7):
            a, du = (u - 3) // 2 + 2, (u - 3) % 2
            b, dv = (v - 3) // 2 + 2, (v - 3) % 2
            m[u, v, a, b, du * 2 + dv] = 1.0
    return m


def _bn(train: bool, dtype, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _maxpool_3x3_s2(x):
    """torch MaxPool2d(3, stride 2, padding 1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class BasicBlock(nn.Module):
    """ResNet-34 residual block (2× conv3×3)."""
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            residual = _bn(train, self.dtype, "down_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """ResNet-50 bottleneck block (1×1 → 3×3(stride) → 1×1·4)."""
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    EXPANSION: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.features * self.EXPANSION
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn(train, self.dtype, "bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            residual = _bn(train, self.dtype, "down_bn")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """ResNet encoder with grayscale stem; yields x1..x5
    (advanced_models.py:72-130, forward at :266-276).

    ``stem_s2d``: inference-path stem rewrite — the 7×7/s2 Cin=1 conv runs
    at 8.3 TF/s on v5e (the MXU sees K=49, and the Cin=1 input wastes
    127/128 lanes); re-expressed over the 2×2 space-to-depth input as a
    4×4/s1 Cin=4 conv (zero-padded to Cin=8, the measured-best variant)
    with an exact weight reparameterization it runs 1.16× faster
    (tools/stem_bench.py, PERF.md round 3). Same params; exact same math
    up to fp reassociation. Engages only when train=False and H, W are
    even."""
    block_counts: Sequence[int]  # (3,4,6,3) for both 34 and 50
    bottleneck: bool
    dtype: jnp.dtype = jnp.float32
    stem_s2d: bool = True
    # engage stem_s2d under train=True as well (see UNetWithBackbone
    # .reparam_in_train; exact linear reparam, fp-reassociation-only drift)
    reparam_in_train: bool = False

    @nn.compact
    def __call__(self, x, train: bool) -> List[jnp.ndarray]:
        w7 = ConvParams((7, 7), 64, use_bias=False, name="input_conv")(
            x.shape[-1])
        x, w7 = nn.dtypes.promote_dtype(x, w7, dtype=self.dtype)
        if (self.stem_s2d and (not train or self.reparam_in_train)
                and x.shape[-1] == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            m = jnp.asarray(_stem_s2d_map(), self.dtype)
            w4 = jnp.einsum("uvabp,uvc->abpc", m, w7[:, :, 0, :])
            w8 = jnp.concatenate([w4, jnp.zeros_like(w4)], axis=2)
            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            xs = x.reshape(b, h // 2, 2, w // 2, 2).transpose(0, 1, 3, 2, 4)
            xs = xs.reshape(b, h // 2, w // 2, 4)
            xs = jnp.concatenate([xs, jnp.zeros_like(xs)], axis=-1)
            x1 = jax.lax.conv_general_dilated(
                xs, w8, (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x1 = jax.lax.conv_general_dilated(
                x, w7, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x1 = _bn(train, self.dtype, "bn1")(x1)
        x1 = nn.relu(x1)

        block = Bottleneck if self.bottleneck else BasicBlock
        widths = (64, 128, 256, 512)
        feats = [x1]
        y = _maxpool_3x3_s2(x1)
        for li, (w, n) in enumerate(zip(widths, self.block_counts)):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                y = block(w, stride=stride, dtype=self.dtype,
                          name=f"layer{li+1}_{bi}")(y, train)
            feats.append(y)
        return feats  # x1..x5


class DenseLayer(nn.Module):
    """DenseNet layer: BN→ReLU→1×1(4k)→BN→ReLU→3×3(k), concat."""
    growth: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = _bn(train, self.dtype, "norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(y)
        y = _bn(train, self.dtype, "norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_layers):
            x = DenseLayer(self.growth, dtype=self.dtype,
                           name=f"denselayer{i+1}")(x, train)
        return x


class Transition(nn.Module):
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = _bn(train, self.dtype, "norm")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(y)
        return nn.avg_pool(y, (2, 2), strides=(2, 2))


class DenseNetEncoder(nn.Module):
    """DenseNet-121 encoder matching the reference's 5-feature extraction
    (advanced_models.py:207-262): x1 = input_conv output (no BN/ReLU),
    x2..x5 = raw dense-block outputs (no final norm5).
    Feature dims: 64, 256, 512, 1024, 1024."""
    block_config: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> List[jnp.ndarray]:
        x1 = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                     dtype=self.dtype, name="input_conv")(x)
        y = _bn(train, self.dtype, "norm0")(x1)
        y = nn.relu(y)
        y = _maxpool_3x3_s2(y)

        feats = [x1]
        ch = 64
        for bi, n in enumerate(self.block_config):
            y = DenseBlock(n, self.growth, dtype=self.dtype,
                           name=f"denseblock{bi+1}")(y, train)
            ch = ch + n * self.growth
            feats.append(y)
            if bi < len(self.block_config) - 1:
                ch = ch // 2
                y = Transition(ch, dtype=self.dtype,
                               name=f"transition{bi+1}")(y, train)
        return feats  # x1..x5


BACKBONE_CHANNELS = {
    "resnet34": (64, 64, 128, 256, 512),
    "resnet50": (64, 256, 512, 1024, 2048),
    "densenet121": (64, 256, 512, 1024, 1024),
    # Test-scale stub: ResNet stage structure with one BasicBlock per stage
    # (same stride/channel plan as resnet34, ~4× fewer convs). Used by the
    # multi-chip dry run and fast tests — sharding/BN/epoch semantics are
    # architecture-size independent, so validating them on the stub is
    # equivalent and compiles in seconds on a 1-core host.
    "resnet_tiny": (64, 64, 128, 256, 512),
}


def make_encoder(backbone: str, dtype=jnp.float32,
                 reparam_in_train: bool = False) -> nn.Module:
    if backbone == "resnet34":
        return ResNetEncoder((3, 4, 6, 3), bottleneck=False, dtype=dtype,
                             reparam_in_train=reparam_in_train,
                             name="encoder")
    if backbone == "resnet50":
        return ResNetEncoder((3, 4, 6, 3), bottleneck=True, dtype=dtype,
                             reparam_in_train=reparam_in_train,
                             name="encoder")
    if backbone == "densenet121":
        return DenseNetEncoder(dtype=dtype, name="encoder")
    if backbone == "resnet_tiny":
        return ResNetEncoder((1, 1, 1, 1), bottleneck=False, dtype=dtype,
                             reparam_in_train=reparam_in_train,
                             name="encoder")
    raise ValueError(f"Unknown backbone: {backbone}")
