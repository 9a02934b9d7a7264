"""Pallas TPU kernels for the U-Net hot ops.

The north-star kernels (BASELINE.json): fused conv3×3 + BN(inference) +
ReLU, and fused 2× transposed-conv upsample + skip concat — the decoder's
two recurring patterns (advanced_models.py:197-205, :284-334).

Design (see /opt/skills/guides/pallas_guide.md):
- NHWC layout; grid over (batch, h-tiles, w-tiles).
- The input lives in HBM (``memory_space=ANY``); each program DMAs its
  (tile+halo)² window into VMEM scratch (the halo overlap forbids plain
  BlockSpec partitioning), runs the 9 shifted MXU matmuls with float32
  accumulation, applies the folded-BN scale/bias + ReLU epilogue in VMEM,
  and writes its output tile once.
- The upsample+concat kernel computes the 2×2-stride-2 transposed conv as
  4 position matmuls written interleaved, and lays the skip copy and the
  upsample result directly into the two channel halves of the output —
  concat never exists as a separate pass.

Every kernel has an XLA reference implementation (`*_xla`) used for
correctness tests and as the default path — per the measured reality that
XLA's conv library is already HBM-bound-optimal for most of these shapes
(tools/kernel_bench.py holds the honest comparison numbers).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------- XLA refs

def conv3x3_bn_relu_xla(x, w, scale, bias):
    """Reference: 3×3 same conv + per-channel scale/bias + ReLU."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(out * scale + bias, 0.0).astype(x.dtype)


def upsample2x_concat_xla(x, w_ct, b_ct, skip):
    """Reference: ConvTranspose(2,2,stride 2) of x, concat with skip
    (channel order [skip, up] — advanced_models.py:288)."""
    up = jax.lax.conv_transpose(
        x, w_ct, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_ct
    return jnp.concatenate([skip, up.astype(skip.dtype)], axis=-1)


# ---------------------------------------------------------- fused conv3x3

def _conv3x3_kernel(x_hbm, w_ref, scale_ref, bias_ref, o_ref, scratch, sem,
                    *, th: int, tw: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    # DMA the haloed input window (input is pre-padded by 1 on H/W).
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2), pl.ds(j * tw, tw + 2), :],
        scratch, sem)
    dma.start()
    dma.wait()

    co = o_ref.shape[-1]
    acc = jnp.zeros((th, tw, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = scratch[dy:dy + th, dx:dx + tw, :]
            acc = acc + jax.lax.dot_general(
                patch, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out = jnp.maximum(acc * scale_ref[:] + bias_ref[:], 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def conv3x3_bn_relu_pallas(x, w, scale, bias, *, tile: int = 64):
    """Fused 3×3 same-conv + folded-BN scale/bias + ReLU.

    x: (B, H, W, Cin), w: (3, 3, Cin, Cout), scale/bias: (Cout,).
    H and W must be divisible by ``tile`` (the U-Net's power-of-two maps
    are)."""
    b, h, wd, cin = x.shape
    co = w.shape[-1]
    assert h % tile == 0 and wd % tile == 0, (h, wd, tile)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kernel = functools.partial(_conv3x3_kernel, th=tile, tw=tile)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        grid=(b, h // tile, wd // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w
            pl.BlockSpec(memory_space=pltpu.VMEM),       # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias
        ],
        out_specs=pl.BlockSpec((1, tile, tile, co),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2, tile + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w, scale, bias)


# ---------------------------------------------------- upsample2x + concat

def _ups_concat_kernel(x_ref, w_ref, b_ref, skip_ref, o_ref, *, cs: int):
    """One (batch, h-tile, w-tile) program: skip copy into channels [:cs],
    2×-upsampled transposed conv of x into channels [cs:]."""
    xt = x_ref[0]                       # (th, tw, cin)
    th, tw, cin = xt.shape
    co = w_ref.shape[-1]
    # 4 position matmuls. lax.conv_transpose (transpose_kernel=False,
    # VALID, stride 2) places out[2h+dy, 2w+dx] = x[h, w] @ w[1-dy, 1-dx]
    # (the dilate-pad-conv formulation flips the position↔tap mapping).
    pieces = []
    for dy in range(2):
        row = []
        for dx in range(2):
            row.append(jax.lax.dot_general(
                xt, w_ref[1 - dy, 1 - dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # (th, tw, co)
        pieces.append(row)
    # interleave: (th, 2, tw, 2, co) → (2th, 2tw, co)
    top = jnp.stack([pieces[0][0], pieces[0][1]], axis=2)   # (th, tw, 2, co)
    bot = jnp.stack([pieces[1][0], pieces[1][1]], axis=2)
    both = jnp.stack([top, bot], axis=1)                    # (th, 2, tw, 2, co)
    up = both.reshape(2 * th, 2 * tw, co) + b_ref[:]
    o_ref[0, :, :, :cs] = skip_ref[0]
    o_ref[0, :, :, cs:] = up.astype(o_ref.dtype)


def upsample2x_concat_pallas(x, w_ct, b_ct, skip, *, tile: int = 32):
    """Fused ConvTranspose(2×2, stride 2) + channel concat with skip.

    x: (B, H, W, Cin); w_ct: (2, 2, Cin, Cout); skip: (B, 2H, 2W, Cs).
    Output: (B, 2H, 2W, Cs + Cout), channels ordered [skip, up]."""
    b, h, w, cin = x.shape
    co = w_ct.shape[-1]
    cs = skip.shape[-1]
    assert skip.shape[1] == 2 * h and skip.shape[2] == 2 * w
    t = min(tile, h, w)
    assert h % t == 0 and w % t == 0

    kernel = functools.partial(_ups_concat_kernel, cs=cs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, cs + co),
                                       skip.dtype),
        grid=(b, h // t, w // t),
        in_specs=[
            pl.BlockSpec((1, t, t, cin), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t, 2 * t, cs), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * t, 2 * t, cs + co),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
    )(x, w_ct, b_ct, skip)


def fold_bn(kernel, bias, bn_scale, bn_bias, bn_mean, bn_var,
            eps: float = 1e-5):
    """Fold inference BatchNorm into conv weights:
    y = scale·(conv(x)+b − mean)/sqrt(var+eps) + shift
      = conv(x)·k' + b'  with  k' = k·s, b' = (b − mean)·s + shift,
    s = scale/sqrt(var+eps). Returns (kernel', bias')."""
    s = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * s, (bias - bn_mean) * s + bn_bias
