"""Transposed-conv rewrite candidate: a 2×2/s2 ConvTranspose is exactly a
1×1 conv Cin→4·Cout followed by depth-to-space (each input pixel emits its
2×2 output block independently — kernel size == stride, no overlap). The
1×1 form runs the MXU at N=4·Cout instead of N=Cout; the open question is
whether the d2s relayout eats the win. Measured at every flagship decoder
shape. Also times the attention-gate block.

Usage: python tools/upconv_bench.py [--batch 128]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} batch={B}", flush=True)

    # flagship resnet34 upconv shapes: (H_in, Cin, Cout)
    shapes = [(16, 512, 256), (32, 256, 128), (64, 128, 64),
              (128, 64, 32), (256, 32, 1)]  # last = fused head
    for h, cin, cout in shapes:
        x = jax.random.normal(jax.random.key(1), (B, h, h, cin), dtype)
        w = jax.random.normal(jax.random.key(2), (2, 2, cin, cout),
                              dtype) * 0.05

        def convt(x, w):
            return jax.lax.conv_transpose(
                x, w, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # 1x1 + d2s: out[2i+dy, 2j+dx, c] = x[i,j,:] @ w[1-dy, 1-dx, :, c]
        # (lax.conv_transpose applies the kernel flipped), so
        # w1[cin, (dy,dx,c)] = w[1-dy, 1-dx, cin, c]
        w1 = jnp.transpose(w[::-1, ::-1], (2, 0, 1, 3)).reshape(
            cin, 4 * cout)

        def one_by_one_d2s(x, w1):
            o = jnp.einsum("bhwc,cn->bhwn", x, w1)  # (B,h,h,4*cout)
            b, hh, ww, _ = o.shape
            o = o.reshape(b, hh, ww, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
            return o.reshape(b, 2 * hh, 2 * ww, cout)

        ref = jax.device_get(convt(x[:2], w).astype(jnp.float32))
        got = jax.device_get(one_by_one_d2s(x[:2], w1).astype(jnp.float32))
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        t0 = _t(convt, x, w)
        t1 = _t(one_by_one_d2s, x, w1)
        g = 2.0 * B * h * h * 4 * cin * cout / 1e9
        print(f"upconv {h:3d}² {cin:4d}->{cout:4d}: convT {t0*1e3:7.2f} ms "
              f"({g/t0/1e3:5.1f} TF/s) | 1x1+d2s {t1*1e3:7.2f} ms "
              f"({g/t1/1e3:5.1f} TF/s) = {t0/t1:4.2f}x (err {err:.1e})",
              flush=True)

    # attention gate at the two big levels: W_g(1x1)+W_x(1x1)+relu+psi+mul
    for h, cg, cx, ci in ((256, 32, 64, 32), (128, 64, 128, 32)):
        g_in = jax.random.normal(jax.random.key(3), (B, h, h, cg), dtype)
        x_in = jax.random.normal(jax.random.key(4), (B, h, h, cx), dtype)
        wg = jax.random.normal(jax.random.key(5), (1, 1, cg, ci), dtype) * .05
        wx = jax.random.normal(jax.random.key(6), (1, 1, cx, ci), dtype) * .05
        wp = jax.random.normal(jax.random.key(7), (1, 1, ci, 1), dtype) * .05

        def gate(g_in, x_in, wg, wx, wp):
            c = lambda a, w: jax.lax.conv_general_dilated(
                a, w, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            att = jax.nn.sigmoid(c(jax.nn.relu(c(g_in, wg) + c(x_in, wx)),
                                   wp))
            return x_in * att

        t = _t(gate, g_in, x_in, wg, wx, wp)
        print(f"attention gate {h:3d}² (g{cg}/x{cx}): {t*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
