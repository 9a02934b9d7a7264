"""Attention modules for the U-Net decoder.

Reference parity: additive attention gate (advanced_models.py:7-40) and
squeeze-and-excitation channel attention (advanced_models.py:43-61), rebuilt
as Flax modules in NHWC. The 1×1 convs here are pure MXU matmuls over the
channel dim — XLA fuses the BN + sigmoid elementwise tails into them.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class AttentionGate(nn.Module):
    """Additive attention gate: psi = σ(BN(conv1x1(relu(BN(Wg·g)+BN(Wx·x)))));
    returns x · psi. (advanced_models.py:7-40)."""
    f_int: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        g1 = norm()(nn.Conv(self.f_int, (1, 1), use_bias=True,
                            dtype=self.dtype, name="W_g")(g))
        x1 = norm()(nn.Conv(self.f_int, (1, 1), use_bias=True,
                            dtype=self.dtype, name="W_x")(x))
        psi = nn.relu(g1 + x1)
        psi = norm()(nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                             name="psi")(psi))
        return x * nn.sigmoid(psi)


class ChannelAttention(nn.Module):
    """SE-style channel attention with avg+max pooled descriptors
    (advanced_models.py:43-61)."""
    reduction_ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        hidden = max(c // self.reduction_ratio, 1)
        fc1 = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")

        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return x * nn.sigmoid(out)
