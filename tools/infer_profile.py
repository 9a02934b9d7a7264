"""Per-stage timing of the flagship 512² inference (ROADMAP #2).

Decomposes the resnet34(+attention) U-Net forward into stages and times
each with the relay-safe two-point fit, to locate the thin-channel time
sinks named by the round-2 roofline (enc1 64-ch convs at 60 TF/s, dec1/2,
the Cin=1 stem, the 16-ch upconv0+head). Also times candidate rewrites:

  - stem-s2d : space-to-depth stem — 7×7/s2 Cin=1 conv re-expressed as a
               4×4/s1 Cin=4 conv on the 2×2-block-transformed input
               (exact weight transform, see stem_s2d_weights)
  - enc1-pad : enc1 64→64 convs zero-padded to 128 output channels

Usage: python tools/infer_profile.py [--batch 128] [--attention]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import two_point_time


def _t(fn, *args):
    return two_point_time(jax.jit(fn), *args,
                          sync=lambda o: jax.device_get(jnp.ravel(o)[0]))


def _conv(x, w, stride=1, pad=None):
    k = w.shape[0]
    if pad is None:
        pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def gflops_conv(b, h, w_, cin, cout, k, stride=1):
    return 2.0 * b * (h // stride) * (w_ // stride) * k * k * cin * cout / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--attention", action="store_true", default=True)
    ap.add_argument("--no-attention", dest="attention", action="store_false")
    args = ap.parse_args()

    from segtpu.models import UNetWithBackbone, create_model_state
    from segtpu.models.backbones import make_encoder

    B, S = args.batch, 512
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} batch={B} size={S} "
          f"attention={args.attention}", flush=True)

    model = UNetWithBackbone(backbone="resnet34", use_attention=args.attention,
                             dtype=dtype)
    params, batch_stats = create_model_state(
        model, jax.random.key(0), (1, S, S, 1))
    x = jax.random.normal(jax.random.key(1), (B, S, S, 1), jnp.float32)

    # ---- full model
    def full(p, bs, x):
        return model.apply({"params": p, "batch_stats": bs}, x, train=False)
    t_full = _t(full, params, batch_stats, x)
    print(f"full forward: {t_full*1e3:8.2f} ms  ({B/t_full:7.1f} img/s)",
          flush=True)

    # ---- encoder only
    enc = make_encoder("resnet34", dtype=dtype)
    ep = {"params": params["encoder"],
          "batch_stats": batch_stats["encoder"]}

    def enc_only(v, x):
        return enc.apply(v, x, train=False)[-1]
    t_enc = _t(enc_only, ep, x)
    print(f"encoder:      {t_enc*1e3:8.2f} ms  (decoder+head = "
          f"{(t_full-t_enc)*1e3:.2f} ms)", flush=True)

    # ---- stem alone (conv7x7 s2, Cin=1) vs s2d rewrite
    kstem = np.asarray(params["encoder"]["input_conv"]["kernel"],
                       np.float32)  # (7,7,1,64)
    w7 = jnp.asarray(kstem, dtype)

    def stem(x, w):
        return _conv(x.astype(dtype), w, stride=2, pad=3)
    t_stem = _t(stem, x, w7)
    g = gflops_conv(B, S, S, 1, 64, 7, 2)
    print(f"stem 7x7/2 Cin=1:  {t_stem*1e3:8.2f} ms  "
          f"({g/t_stem/1e3:6.1f} TF/s)", flush=True)

    # s2d: x (B,512,512,1) -> (B,256,256,4); w7 -> w4 (4,4,4,64)
    w4 = np.zeros((4, 4, 4, 64), np.float32)
    for u in range(7):
        for v in range(7):
            a, du = (u - 3) // 2 + 2, (u - 3) % 2
            bb, dv = (v - 3) // 2 + 2, (v - 3) % 2
            w4[a, bb, du * 2 + dv] += kstem[u, v, 0]
    w4 = jnp.asarray(w4, dtype)

    def stem_s2d(x, w):
        b, h, w_, _ = x.shape
        xs = x.reshape(b, h // 2, 2, w_ // 2, 2).transpose(0, 1, 3, 2, 4)
        xs = xs.reshape(b, h // 2, w_ // 2, 4).astype(dtype)
        return _conv(xs, w, stride=1, pad=None)  # pad 1 -> 256² out? k=4
    # NOTE pad: k=4 needs asymmetric pad (1,2) to match the 7x7/p3 taps
    def stem_s2d_exact(x, w):
        b, h, w_, _ = x.shape
        xs = x.reshape(b, h // 2, 2, w_ // 2, 2).transpose(0, 1, 3, 2, 4)
        xs = xs.reshape(b, h // 2, w_ // 2, 4).astype(dtype)
        return jax.lax.conv_general_dilated(
            xs, w, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t_s2d = _t(stem_s2d_exact, x, w4)
    # parity check
    a = jax.device_get(stem(x[:2], w7).astype(jnp.float32))
    bq = jax.device_get(stem_s2d_exact(x[:2], w4).astype(jnp.float32))
    err = np.abs(a - bq).max() / (np.abs(a).max() + 1e-9)
    print(f"stem s2d 4x4 Cin=4: {t_s2d*1e3:8.2f} ms  (rel err {err:.2e})",
          flush=True)

    # ---- enc1-shape conv 3x3 64->64 @256² (after stem+pool: 128²? both)
    for hh, cin, cout, tag in ((256, 64, 64, "x1-level"),
                               (128, 64, 64, "enc1"),
                               (128, 64, 128, "enc1-pad128"),
                               (64, 128, 128, "enc2"),
                               (256, 96, 32, "dec1cat"),
                               (512, 32, 16, "upconv0-ish"),
                               (512, 16, 1, "head")):
        xx = jax.random.normal(jax.random.key(2), (B, hh, hh, cin), dtype)
        ww = jax.random.normal(jax.random.key(3), (3, 3, cin, cout),
                               dtype) * 0.05
        t = _t(lambda a, b2: _conv(a, b2), xx, ww)
        g = gflops_conv(B, hh, hh, cin, cout, 3)
        print(f"conv3x3 {tag:12s} {hh:4d}² {cin:4d}->{cout:4d}: "
              f"{t*1e3:8.2f} ms ({g/t/1e3:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
