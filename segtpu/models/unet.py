"""U-Net with configurable pretrained-style backbone and attention.

Reference parity: ``UNetWithBackbone`` (advanced_models.py:64-357) — same
three backbones (resnet34/resnet50/densenet121), same decoder channel plan,
optional additive attention gates + SE channel attention at all four decoder
levels, crop-based size-mismatch handling, ``return_features`` fused
encoder features. Rebuilt TPU-first: NHWC layout, Flax modules, static-shape
crops resolved at trace time, BN with mutable ``batch_stats`` collection.

The decoder's conv3×3+BN+ReLU blocks and transposed-conv upsamples are the
hot ops targeted by the Pallas kernels in ``segtpu/kernels`` (enabled via
``fuse='pallas'`` once benchmarked; default XLA path is the parity
reference).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from segtpu.models.attention import AttentionGate, ChannelAttention
from segtpu.models.backbones import (BACKBONE_CHANNELS, ConvParams,
                                      make_encoder)
from segtpu.ops.resize import resize_bilinear

# Decoder plan per backbone: per level (upconv out, decoder out), then the
# attention-gate intermediate dims — advanced_models.py:89-100, 119-130,
# 143-155, 162-195.
_DECODER_PLAN = {
    "resnet34": dict(up=(256, 128, 64, 32), dec=(256, 128, 64, 32),
                     att_int=(128, 64, 32, 32), head_in=32),
    "resnet50": dict(up=(1024, 512, 256, 64), dec=(1024, 512, 256, 64),
                     att_int=(512, 256, 128, 32), head_in=64),
    "densenet121": dict(up=(512, 256, 128, 64), dec=(512, 256, 128, 64),
                        att_int=(256, 128, 64, 32), head_in=64),
}
# Test-scale stub encoder shares resnet34's channel plan (backbones.py).
_DECODER_PLAN["resnet_tiny"] = _DECODER_PLAN["resnet34"]


def _center_crop_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Center-crop spatial dims (static; advanced_models.py:317-325)."""
    dh = x.shape[1] - h
    dw = x.shape[2] - w
    if dh > 0 or dw > 0:
        return x[:, dh // 2: dh // 2 + h, dw // 2: dw // 2 + w, :]
    return x


class _DecoderBlock(nn.Module):
    """Decoder block: [conv3×3 → BN → ReLU] ×2 over the concatenated
    (skip, up) input (advanced_models.py:197-205 semantics). The concat
    happens at the call site so the Pallas-fused upsample path can hand in
    a pre-concatenated tensor.

    Perf note (measured on v5e, 512²/bs8): expressing the skip concat as
    kernel-sliced split convs does NOT help — XLA already folds the concat
    into the conv input (8.51 GB vs 8.59 GB accessed, 13.3 ms vs 14.0 ms) —
    so the straightforward concat form is kept."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in (1, 2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class _UpConv2x(nn.Module):
    """2×2-stride-2 transposed conv with an optional Pallas-fused
    upsample+skip-concat path (segtpu.kernels.upsample2x_concat_pallas,
    measured 0.49× XLA time at b8 128→256 decoder shapes — PERF.md).

    Declares the exact params of the ``nn.ConvTranspose`` it replaces —
    same names (kernel/bias), shapes ((2,2,Cin,Cout)/(Cout,)), initializers
    (flax ``default_kernel_init`` / zeros) and ``param_dtype`` — so
    checkpoints and param trees are bit-identical whether fusion is enabled
    or not.

    ``__call__(x, skip=None, fused=False)``:
    - ``fused=False``: returns the plain upsample (flax ConvTranspose
      semantics: lax.conv_transpose VALID stride-2 + bias).
    - ``fused=True`` (requires ``skip``): returns
      ``concat([skip, upsample(x)], axis=-1)`` computed in one Pallas pass —
      the upsample never round-trips HBM as a separate tensor.
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, fused: bool = False):
        from flax.linen.linear import default_kernel_init
        kernel = self.param("kernel", default_kernel_init,
                            (2, 2, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        if fused:
            assert skip is not None
            from contextlib import nullcontext
            from jax.experimental.pallas import tpu as pltpu
            from segtpu.kernels.fused_conv import upsample2x_concat_pallas
            ctx = (pltpu.force_tpu_interpret_mode()
                   if jax.default_backend() != "tpu" else nullcontext())
            with ctx:
                return upsample2x_concat_pallas(
                    x, kernel, bias.astype(jnp.float32), skip)
        up = jax.lax.conv_transpose(
            x, kernel, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return up + bias.reshape((1,) * (up.ndim - 1) + (-1,))


class UNetWithBackbone(nn.Module):
    """Attention U-Net over a pretrained-style encoder.

    Args mirror the reference constructor (advanced_models.py:65):
    n_classes, backbone ∈ {resnet34, resnet50, densenet121}, use_attention.
    (``pretrained`` is handled outside the module: see
    ``segtpu.models.torch_convert.load_pretrained_encoder``.)

    Input NHWC (B, H, W, 1); output logits (B, H, W, n_classes).
    """
    n_classes: int = 1
    backbone: str = "resnet34"
    use_attention: bool = True
    dtype: jnp.dtype = jnp.float32
    # Optional foreground prior p for the final conv bias
    # (bias = log(p/(1-p))). Fixes the all-background cold start of plain
    # BCE on imbalanced masks when training from scratch (the reference
    # avoids it via pretrained encoders, which need a local checkpoint
    # here). None = torch-default init (reference parity).
    final_bias_prior: Optional[float] = None
    # Inference-path kernel fusion: "none" (XLA everywhere, the parity
    # reference; the measured-best default) or "pallas" (route decoder
    # upsample+skip-concat through upsample2x_concat_pallas). Fusion
    # engages only when train=False (Pallas kernels define no VJP) and only
    # without attention gates (the gate consumes the materialized upsample,
    # advanced_models.py:287).
    #
    # MEASURED NEGATIVE RESULT (v5e, PERF.md round 2): standalone the
    # kernel beats XLA 1.6–4× at the high-channel decoder shapes, but the
    # standalone XLA baseline materializes the concat — IN the model XLA
    # folds the concat into the next conv's input reads, so the kernel's
    # fused output is pure extra HBM traffic (+2.5 GB, +3–5 ms per fused
    # level at 512²/bs128; e2e 57.2→66.4 ms with two levels fused). The
    # default therefore stays "none"; the option and its parity tests are
    # kept as the evidence base (tests/test_fuse.py).
    fuse: str = "none"
    # Per-level gate when fuse="pallas": input channels ≥ fuse_min_cin AND
    # B·H·W ≥ fuse_min_work (the standalone-profitable region). Tests set
    # both to 0 to force fusion at toy shapes.
    fuse_min_cin: int = 96
    fuse_min_work: int = 16384
    # Inference-path head fusion (weight-space, always exact up to fp
    # reassociation): contract upconv0's (2,2,Cin,16) transposed-conv
    # kernel with conv_final's (1,1,16,n) kernel into one (2,2,Cin,n)
    # transposed conv, skipping the full-resolution 16-channel
    # intermediate. Engages only when train=False (or reparam_in_train).
    fuse_head: bool = True
    # Inference-path fused attention gates: fold the gate's three
    # inference BatchNorms into the 1×1-conv weights and run the whole
    # gate (two matmuls + relu + psi matvec + sigmoid + multiply) as ONE
    # Pallas pass. Exact up to fp reassociation; param tree unchanged.
    #
    # MEASURED NEGATIVE RESULT (v5e, PERF.md round 3): the kernel itself
    # hits ~4 ms at the level-1 shape (vs ~10 ms XLA) when operands are
    # already lane-packed, but ANY Pallas kernel consuming the model's
    # thin-channel NHWC activations pays a forced relayout at the
    # custom-call boundary (~8-10 ms per 512²·C∈{32,64} tensor) — e2e
    # 64.3 → 92.4 ms at bs128. Default therefore False; kernel + parity
    # tests kept as the evidence base (tests/test_kernels.py).
    fuse_gate: bool = False
    # Apply the exact linear reparameterizations (fuse_head, stem_s2d) in
    # TRAINING too: gradients/updates are mathematically identical (linear
    # weight-space rewrites), numerics differ only by fp reassociation.
    # Off by default (reference-parity training numerics).
    reparam_in_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        plan = _DECODER_PLAN[self.backbone]
        feats = make_encoder(self.backbone, dtype=self.dtype,
                     reparam_in_train=self.reparam_in_train)(
                         x, train)
        x1, x2, x3, x4, x5 = feats

        d = x5
        skips = (x4, x3, x2, x1)
        for lvl, skip in zip((4, 3, 2, 1), skips):
            i = 4 - lvl
            upconv = _UpConv2x(plan["up"][i], dtype=self.dtype,
                               name=f"upconv{lvl}")
            up_h, up_w = 2 * d.shape[1], 2 * d.shape[2]
            if lvl == 1 and (up_h != skip.shape[1] or up_w != skip.shape[2]):
                skip = _center_crop_to(skip, up_h, up_w)
            fused = (self.fuse == "pallas" and not train
                     and not self.use_attention
                     and d.shape[-1] >= self.fuse_min_cin
                     and d.shape[0] * d.shape[1] * d.shape[2]
                     >= self.fuse_min_work
                     and d.shape[1] % min(32, d.shape[1]) == 0
                     and d.shape[2] % min(32, d.shape[2]) == 0)
            if self.use_attention:
                d = upconv(d)
                skip_att = AttentionGate(plan["att_int"][i], dtype=self.dtype,
                                         name=f"attention{lvl}")(
                                             g=d, x=skip, train=train,
                                             fused=self.fuse_gate)
                # concat order = (skip, up), matching
                # torch.cat((x_att, d), dim=1) at advanced_models.py:288
                cat = jnp.concatenate([skip_att, d], axis=-1)
                d = _DecoderBlock(plan["dec"][i], dtype=self.dtype,
                                  name=f"decoder{lvl}")(cat, train)
                d = ChannelAttention(dtype=self.dtype,
                                     name=f"ch_attention{lvl}")(d)
            else:
                if fused:
                    cat = upconv(d, skip=skip, fused=True)
                else:
                    cat = jnp.concatenate([skip, upconv(d)], axis=-1)
                d = _DecoderBlock(plan["dec"][i], dtype=self.dtype,
                                  name=f"decoder{lvl}")(cat, train)

        if self.final_bias_prior is not None:
            import math
            p = float(self.final_bias_prior)
            bias_init = nn.initializers.constant(math.log(p / (1.0 - p)))
        else:
            bias_init = nn.initializers.zeros_init()
        # Head: upconv0 (2×2/s2 transposed conv 32→16) then conv_final
        # (1×1 16→n). There is no nonlinearity between them (matching
        # advanced_models.py:157-160,337-350), so the composition is ONE
        # linear map: at inference the two kernels are contracted into a
        # single (2,2,Cin,n) transposed conv — the (B,512,512,16)
        # intermediate (1.7 GB at bs128/bf16) never touches HBM. Measured:
        # see PERF.md round 3. Params keep the reference tree (upconv0/
        # conv_final, same names/shapes/inits) so checkpoints are
        # unaffected; training uses the unfused two-op form.
        w0, b0 = ConvParams((2, 2), 16, name="upconv0")(d.shape[-1])
        wf, bf = ConvParams((1, 1), self.n_classes, bias_init=bias_init,
                            name="conv_final")(16)
        d, w0, b0, wf, bf = nn.dtypes.promote_dtype(
            d, w0, b0, wf, bf, dtype=self.dtype)
        if self.fuse_head and (not train or self.reparam_in_train):
            # contracted kernel (2,2,Cin,n), then the stride-2 transposed
            # conv expressed as one 1×1 matmul + depth-to-space: kernel
            # size == stride means each input pixel emits its 2×2 output
            # block independently, so out[2i+dy, 2j+dx, c] =
            # d[i,j,:] @ w[1-dy, 1-dx, :, c] (lax.conv_transpose applies
            # the kernel flipped). Measured 6.5× faster than the convT
            # form at 256²→512² Cout=1 (the convT writes a C=1
            # lane-padded tensor; the matmul output is C=4n compact) —
            # tools/upconv_bench.py, PERF.md round 3.
            w = jnp.einsum("abio,on->abin", w0, wf[0, 0])
            b = bf + b0 @ wf[0, 0]
            n = w.shape[-1]
            w1 = jnp.transpose(w[::-1, ::-1], (2, 0, 1, 3)).reshape(
                d.shape[-1], 4 * n)
            o = jnp.einsum("bhwc,cn->bhwn", d, w1)
            bb, hh, ww = o.shape[0], o.shape[1], o.shape[2]
            o = o.reshape(bb, hh, ww, 2, 2, n).transpose(0, 1, 3, 2, 4, 5)
            out = o.reshape(bb, 2 * hh, 2 * ww, n) + b.reshape((1, 1, 1, -1))
            out = _center_crop_to(out, x.shape[1], x.shape[2])
        else:
            d0 = jax.lax.conv_transpose(
                d, w0, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            d0 = d0 + b0.reshape((1, 1, 1, -1))
            d0 = _center_crop_to(d0, x.shape[1], x.shape[2])
            out = jax.lax.conv_general_dilated(
                d0, wf, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = out + bf.reshape((1, 1, 1, -1))

        if return_features:
            # Fuse x2 (bilinear-upsampled to x3's size) with x3
            # (advanced_models.py:352-356). Resize per (batch, channel) 2-D
            # slice: (B,H,W,C) → (B,C,H,W) → vmap² → back.
            bchw = jnp.moveaxis(x2, -1, 1)
            up = jax.vmap(jax.vmap(lambda im: resize_bilinear(
                im, (x3.shape[1], x3.shape[2]))))(bchw)
            x2_up = jnp.moveaxis(up, 1, -1)
            combined = jnp.concatenate([x2_up, x3], axis=-1)
            return out, combined
        return out


_INIT_FN_CACHE: Dict = {}


def create_model_state(model: UNetWithBackbone, rng: jax.Array,
                       input_shape: Tuple[int, ...] = (1, 128, 128, 1)
                       ) -> Tuple[Dict, Dict]:
    """Initialize (params, batch_stats) for a model.

    The jitted init is cached per (model, shape) — a fresh `jax.jit`
    wrapper would re-TRACE the full network on every call (seconds of
    host work per CV fold on a 1-core machine) even when the XLA
    executable is compile-cache-hit."""
    try:
        key = (model, tuple(input_shape))
        init = _INIT_FN_CACHE.get(key)
    except TypeError:  # unhashable model: fall back to per-call jit
        key, init = None, None
    if init is None:
        init = jax.jit(lambda k: model.init(
            k, jnp.zeros(input_shape, model.dtype), train=False))
        if key is not None:
            _INIT_FN_CACHE[key] = init
    variables = init(rng)
    return variables["params"], variables.get("batch_stats", {})
