"""Attention modules for the U-Net decoder.

Reference parity: additive attention gate (advanced_models.py:7-40) and
squeeze-and-excitation channel attention (advanced_models.py:43-61), rebuilt
as Flax modules in NHWC. The 1×1 convs here are pure MXU matmuls over the
channel dim — XLA fuses the BN + sigmoid elementwise tails into them.

Inference fast path (``fused=True``): the three BatchNorms are affine at
inference, so the whole gate folds into two matmul weight sets + biases,
and one Pallas pass (segtpu/kernels/attention_gate.py) computes the gate
with floor HBM traffic (read g, read x, write out — the XLA form also
materializes and re-reads the f_int hidden map). Exact up to fp
reassociation; the param/batch_stats tree is bit-identical to the
unfused modules (ConvParams/BNParams declare the same leaves).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from segtpu.models.backbones import ConvParams

_BN_EPS = 1e-5


class BNParams(nn.Module):
    """Parameter-only leaf matching ``nn.BatchNorm``'s tree: scale/bias in
    params, mean/var in batch_stats — same names, shapes, initializers.
    Lets the fused gate fold inference BN into matmul weights while
    checkpoints/param trees stay bit-identical to the plain-module form."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean.value, var.value


class AttentionGate(nn.Module):
    """Additive attention gate: psi = σ(BN(conv1x1(relu(BN(Wg·g)+BN(Wx·x)))));
    returns x · psi. (advanced_models.py:7-40)."""
    f_int: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray, train: bool,
                 fused: bool = False) -> jnp.ndarray:
        if fused and not train:
            # Declare the exact same leaves as the unfused branch
            # (creation order fixes the BatchNorm_{0,1,2} auto-names),
            # fold BN(y) = y·k + (β − m·k), k = s/√(v+ε) into the conv
            # weights, and run the one-pass kernel.
            wg, bg = ConvParams((1, 1), self.f_int, name="W_g")(g.shape[-1])
            s0, b0, m0, v0 = BNParams(name="BatchNorm_0")(self.f_int)
            wx, bx = ConvParams((1, 1), self.f_int, name="W_x")(x.shape[-1])
            s1, b1, m1, v1 = BNParams(name="BatchNorm_1")(self.f_int)
            wp, bp = ConvParams((1, 1), 1, name="psi")(self.f_int)
            s2, b2, m2, v2 = BNParams(name="BatchNorm_2")(1)

            k0 = s0 / jnp.sqrt(v0 + _BN_EPS)
            k1 = s1 / jnp.sqrt(v1 + _BN_EPS)
            k2 = s2 / jnp.sqrt(v2 + _BN_EPS)
            ag = wg[0, 0] * k0                       # (Cg, F)
            ax = wx[0, 0] * k1                       # (Cx, F)
            bh = (bg - m0) * k0 + b0 + (bx - m1) * k1 + b1   # (F,)
            apsi = wp[0, 0, :, 0] * k2[0]            # (F,)
            bpsi = (bp[0] - m2[0]) * k2[0] + b2[0]   # scalar

            from segtpu.kernels.attention_gate import attention_gate_fused
            dt = self.dtype
            return attention_gate_fused(
                g.astype(dt), x.astype(dt), ag.astype(dt), ax.astype(dt),
                bh.astype(jnp.float32), apsi.astype(dt),
                bpsi.astype(jnp.float32))

        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=_BN_EPS,
                                    dtype=self.dtype)
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
