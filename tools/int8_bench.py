"""Int8 conv-as-matmul microbenchmark (ROADMAP #1, VERDICT round-1 #3).

Round 1 established that ``lax.conv`` with int8 operands is emulated on
this stack (~44x slower than bf16), while a plain int8 ``dot_general``
with int32 accumulation hits the MXU at ~289 TOP/s (1.6x the bf16 rate).
This tool measures whether routing the U-Net's 3x3 convs through int8
matmuls wins end-to-end at the real layer shapes:

  - ``bf16``     : lax.conv_general_dilated, the production baseline
  - ``i8-im2col``: pad -> 9 shifted views concat along C -> one
                   (B*H*W, 9*Cin) x (9*Cin, Cout) int8 dot -> int32 ->
                   per-channel scale (the dequant+BN fold) -> relu
  - ``i8-9dot``  : sum of 9 (B*H*W, Cin) x (Cin, Cout) int8 dots (no
                   9x input materialization; accumulate in int32)

Timing uses the same two-point fit as bench.py (the relay's fixed ~1s
sync cost cancels out).

Usage: python tools/int8_bench.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from timing import two_point_time


def _time(fn, *args, iters=(3, 9), reps=2) -> float:
    return two_point_time(fn, *args, iters=iters, reps=reps,
                          sync=lambda o: jax.device_get(jnp.ravel(o)[0]))


@functools.partial(jax.jit, static_argnames=())
def conv_bf16(x, w, scale, bias):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(out * scale + bias, 0.0).astype(x.dtype)


def _shifted_views(xp, h, w):
    """9 (B,H,W,C) views of the (B,H+2,W+2,C) padded input."""
    return [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]


@jax.jit
def conv_i8_im2col(x8, w8_flat, scale, bias):
    """x8 (B,H,W,C) int8; w8_flat (9*Cin, Cout) int8 (taps stacked in the
    same (dy,dx) order as _shifted_views)."""
    b, h, w, c = x8.shape
    xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(_shifted_views(xp, h, w), axis=-1)
    acc = jax.lax.dot_general(
        cols.reshape(b * h * w, 9 * c), w8_flat,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale + bias
    return jnp.maximum(out, 0.0).reshape(b, h, w, -1).astype(jnp.bfloat16)


@jax.jit
def conv_i8_9dot(x8, w8_taps, scale, bias):
    """w8_taps (9, Cin, Cout) int8."""
    b, h, w, c = x8.shape
    xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i, v in enumerate(_shifted_views(xp, h, w)):
        d = jax.lax.dot_general(
            v.reshape(b * h * w, c), w8_taps[i],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    out = acc.astype(jnp.float32) * scale + bias
    return jnp.maximum(out, 0.0).reshape(b, h, w, -1).astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    bsz = args.batch

    # (name, H, Cin, Cout): the flagship's conv-heavy layers at 512^2 input
    shapes = [
        ("enc layer1", 128, 64, 64),
        ("enc layer2", 64, 128, 128),
        ("enc layer3", 32, 256, 256),
        ("dec4 conv", 16, 512, 256),
        ("dec3 conv", 32, 256, 128),
        ("dec2 conv", 64, 128, 64),
        ("dec1 conv", 128, 128, 64),
    ]
    key = jax.random.key(0)
    print(f"batch={bsz}  (times per call; TFLOP/s for the 3x3 conv)")
    print(f"{'layer':>12} {'shape':>16} {'bf16':>8} {'i8-im2col':>10} "
          f"{'i8-9dot':>8}  speedups")
    for name, hh, cin, cout in shapes:
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (bsz, hh, hh, cin), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, cin, cout), jnp.bfloat16) * 0.1
        scale = jnp.ones((cout,), jnp.float32) * 0.02
        bias = jnp.zeros((cout,), jnp.float32)
        x8 = jnp.clip(x.astype(jnp.float32) * 16, -127, 127).astype(jnp.int8)
        w8 = jnp.clip(w.astype(jnp.float32) * 64, -127, 127).astype(jnp.int8)
        w8_taps = w8.reshape(9, cin, cout)
        w8_flat = w8.reshape(9 * cin, cout)

        t_bf = _time(conv_bf16, x, w, scale, bias)
        t_im = _time(conv_i8_im2col, x8, w8_flat, scale, bias)
        t_9d = _time(conv_i8_9dot, x8, w8_taps, scale, bias)
        fl = 2 * 9 * cin * cout * hh * hh * bsz
        print(f"{name:>12} {hh:>4}x{cin:>4}->{cout:<4} "
              f"{t_bf*1e3:7.2f}ms {t_im*1e3:8.2f}ms {t_9d*1e3:7.2f}ms  "
              f"im2col {t_bf/t_im:4.2f}x  9dot {t_bf/t_9d:4.2f}x  "
              f"(bf16 {fl/t_bf/1e12:5.1f} TF/s, "
              f"i8 best {fl/min(t_im, t_9d)/1e12:5.1f} TOP/s)")


if __name__ == "__main__":
    main()
