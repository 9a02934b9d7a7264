"""Stem rewrite candidates (ROADMAP #2): the 7×7/s2 Cin=1 conv runs at
8.3 TF/s (6.3 ms of the 512²/bs128 forward). Space-to-depth re-expresses
it as a 4×4/s1 Cin=4 conv (exact weight transform); the open question is
which s2d lowering XLA likes. Also measures the real head ops to record
the fusion win.

Usage: python tools/stem_bench.py [--batch 128]
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


def s2d_weights(k7: np.ndarray) -> np.ndarray:
    """(7,7,1,C) stem kernel → exact (4,4,4,C) s2d kernel (phase layout
    ch = 2*du+dv, conv padding (2,1))."""
    c = k7.shape[-1]
    w4 = np.zeros((4, 4, 4, c), k7.dtype)
    for u in range(7):
        for v in range(7):
            a, du = (u - 3) // 2 + 2, (u - 3) % 2
            b, dv = (v - 3) // 2 + 2, (v - 3) % 2
            w4[a, b, du * 2 + dv] += k7[u, v, 0]
    return w4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B, S = args.batch, 512
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} batch={B}", flush=True)

    rng = np.random.default_rng(0)
    k7 = rng.standard_normal((7, 7, 1, 64)).astype(np.float32) * 0.1
    w7 = jnp.asarray(k7, dtype)
    w4 = jnp.asarray(s2d_weights(k7), dtype)
    x = jax.random.normal(jax.random.key(1), (B, S, S, 1), jnp.float32)

    def baseline(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t0 = _t(baseline, x, w7)
    ref = jax.device_get(baseline(x[:2], w7).astype(jnp.float32))
    print(f"baseline 7x7/s2 Cin=1:        {t0*1e3:7.2f} ms", flush=True)

    def conv4(xs, w):
        return jax.lax.conv_general_dilated(
            xs, w, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # v1: reshape+transpose s2d
    def s2d_transpose(x, w):
        b, h, ww, _ = x.shape
        xs = x.reshape(b, h // 2, 2, ww // 2, 2).transpose(0, 1, 3, 2, 4)
        return conv4(xs.reshape(b, h // 2, ww // 2, 4).astype(dtype), w)

    # v2: strided slices + stack
    def s2d_slices(x, w):
        xs = jnp.stack([x[:, 0::2, 0::2, 0], x[:, 0::2, 1::2, 0],
                        x[:, 1::2, 0::2, 0], x[:, 1::2, 1::2, 0]],
                       axis=-1)  # ch order (du,dv) = 00,01,10,11 ✓
        return conv4(xs.astype(dtype), w)

    # v3: phase-extraction via a tiny conv (2x2/s2, 4 one-hot filters)
    eye = np.zeros((2, 2, 1, 4), np.float32)
    for du in range(2):
        for dv in range(2):
            eye[du, dv, 0, du * 2 + dv] = 1.0
    eye_w = jnp.asarray(eye, dtype)

    def s2d_conv(x, w):
        xs = jax.lax.conv_general_dilated(
            x.astype(dtype), eye_w, (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return conv4(xs, w)

    # v4: fold s2d into bf16 cast via dynamic slicing in one fused op:
    # 4 shifted stride-2 convs of the ORIGINAL input with 4x4 kernels per
    # phase — i.e. express the conv as sum of 4 stride-2 convs (no
    # materialized s2d tensor).
    def s2d_sum(x, w):
        xb = x.astype(dtype)
        out = None
        for p in range(4):
            du, dv = p // 2, p % 2
            # phase input x[:, du::2, dv::2] as stride-2 conv with offset:
            # pad so taps align: kernel (4,4) over the phase grid
            xp = xb[:, du:, dv:, :]
            o = jax.lax.conv_general_dilated(
                xp, w[:, :, p:p + 1, :], (2, 2),
                [(4, 3 - du), (4, 3 - dv)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = o if out is None else out + o
        return out

    for name, fn in (("s2d transpose", s2d_transpose),
                     ("s2d slices   ", s2d_slices),
                     ("s2d conv     ", s2d_conv),
                     ("s2d sum4     ", s2d_sum)):
        try:
            got = jax.device_get(fn(x[:2], w4).astype(jnp.float32))
            if got.shape != ref.shape:
                print(f"{name}: shape {got.shape} != {ref.shape}")
                continue
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            t = _t(fn, x, w4)
            print(f"{name}: {t*1e3:7.2f} ms  (rel err {err:.2e}, "
                  f"{t0/t:4.2f}x faster)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()


def extra(batch=128):
    B, S = batch, 512
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    k7 = rng.standard_normal((7, 7, 1, 64)).astype(np.float32) * 0.1
    w7 = jnp.asarray(k7, dtype)
    x = jax.random.normal(jax.random.key(1), (B, S, S, 1), jnp.float32)

    def baseline(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t0 = _t(baseline, x, w7)
    ref = jax.device_get(baseline(x[:2], w7).astype(jnp.float32))
    print(f"baseline 7x7/s2 Cin=1: {t0*1e3:7.2f} ms", flush=True)

    # v5: Cin padded 4->8 (K=128)
    w4 = s2d_weights(k7)
    w8 = np.zeros((4, 4, 8, 64), np.float32)
    w8[:, :, :4] = w4
    w8j = jnp.asarray(w8, dtype)

    def s2d_pad8(x, w):
        b, h, ww, _ = x.shape
        xs = x.reshape(b, h // 2, 2, ww // 2, 2).transpose(0, 1, 3, 2, 4)
        xs = xs.reshape(b, h // 2, ww // 2, 4).astype(dtype)
        xs = jnp.concatenate([xs, jnp.zeros_like(xs)], axis=-1)
        return jax.lax.conv_general_dilated(
            xs, w, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # v6: block-4 s2d, 3x3 conv Cin=16 -> Cout=256 (4 output phases x 64),
    # depth-to-space back to (256,256,64)
    w3 = np.zeros((3, 3, 16, 256), np.float32)
    for dy in range(2):
        for t in range(7):
            m = 2 * dy + t - 3
            a, er = m // 4 + 1, m % 4
            for dx in range(2):
                for s_ in range(7):
                    n = 2 * dx + s_ - 3
                    bb, ec = n // 4 + 1, n % 4
                    w3[a, bb, er * 4 + ec, (dy * 2 + dx) * 64:
                       (dy * 2 + dx) * 64 + 64] += k7[t, s_, 0]
    w3j = jnp.asarray(w3, dtype)

    def s2d_block4(x, w):
        b, h, ww, _ = x.shape
        hb, wb = h // 4, ww // 4
        xs = x.reshape(b, hb, 4, wb, 4).transpose(0, 1, 3, 2, 4)
        xs = xs.reshape(b, hb, wb, 16).astype(dtype)
        o = jax.lax.conv_general_dilated(
            xs, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        o = o.reshape(b, hb, wb, 2, 2, 64).transpose(0, 1, 3, 2, 4, 5)
        return o.reshape(b, 2 * hb, 2 * wb, 64)

    for name, fn, w in (("s2d pad8  ", s2d_pad8, w8j),
                        ("s2d block4", s2d_block4, w3j)):
        try:
            got = jax.device_get(fn(x[:2], w).astype(jnp.float32))
            if got.shape != ref.shape:
                print(f"{name}: shape {got.shape} != {ref.shape}")
                continue
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            t = _t(fn, x, w)
            print(f"{name}: {t*1e3:7.2f} ms  (rel err {err:.2e}, "
                  f"{t0/t:4.2f}x faster)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
