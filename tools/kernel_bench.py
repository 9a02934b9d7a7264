"""Microbenchmark: Pallas fused kernels vs XLA on real TPU decoder shapes.

Run on the TPU (default env). Timing uses the tunnel-safe two-point fit
(see bench.py). Records results so the default path choice (XLA vs Pallas)
is evidence-based.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.kernels.fused_conv import (
    conv3x3_bn_relu_pallas, conv3x3_bn_relu_xla,
    upsample2x_concat_pallas, upsample2x_concat_xla)


def timeit(fn, *args, n1=10, n2=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        return time.perf_counter() - t0

    t1 = min(run(n1), run(n1))
    t2 = min(run(n2), run(n2))
    return (t2 - t1) / (n2 - n1)


def bench_conv(b, h, c_in, c_out, dtype=jnp.bfloat16, tile=64):
    k = jax.random.key(0)
    x = jax.random.normal(k, (b, h, h, c_in), dtype)
    w = jax.random.normal(k, (3, 3, c_in, c_out), dtype) * 0.05
    s = jnp.ones((c_out,), jnp.float32)
    bi = jnp.zeros((c_out,), jnp.float32)
    t_x = timeit(conv3x3_bn_relu_xla, x, w, s, bi)
    try:
        t_p = timeit(lambda *a: conv3x3_bn_relu_pallas(*a, tile=min(tile, h)),
                     x, w, s, bi)
    except Exception as e:
        t_p = float("nan")
        print("  pallas failed:", type(e).__name__, str(e)[:200])
    print(f"conv3x3 b{b} {h}x{h} {c_in}->{c_out}: "
          f"XLA {t_x*1e3:.3f} ms  Pallas {t_p*1e3:.3f} ms  "
          f"ratio {t_p/t_x:.2f}x")


def bench_ups(b, h, c_in, c_out, c_skip, dtype=jnp.bfloat16, tile=32):
    k = jax.random.key(0)
    x = jax.random.normal(k, (b, h, h, c_in), dtype)
    w = jax.random.normal(k, (2, 2, c_in, c_out), dtype) * 0.1
    bi = jnp.zeros((c_out,), jnp.float32)
    skip = jax.random.normal(k, (b, 2 * h, 2 * h, c_skip), dtype)
    t_x = timeit(upsample2x_concat_xla, x, w, bi, skip)
    try:
        t_p = timeit(lambda *a: upsample2x_concat_pallas(*a, tile=min(tile, h)),
                     x, w, bi, skip)
    except Exception as e:
        t_p = float("nan")
        print("  pallas failed:", type(e).__name__, str(e)[:200])
    print(f"ups2x+cat b{b} {h}->{2*h} {c_in}->{c_out}+{c_skip}: "
          f"XLA {t_x*1e3:.3f} ms  Pallas {t_p*1e3:.3f} ms  "
          f"ratio {t_p/t_x:.2f}x")


if __name__ == "__main__":
    B = 8
    print("== decoder conv shapes (512² input flagship) ==")
    bench_conv(B, 64, 512, 256)    # decoder4 conv1 (concat 512ch at 64²... 32² for 512 input)
    bench_conv(B, 128, 256, 128)   # decoder3 conv1
    bench_conv(B, 256, 128, 64)    # decoder2 conv1
    bench_conv(B, 256, 96, 32)     # decoder1 conv1 at 256²
    bench_conv(B, 256, 64, 64)     # encoder-ish
    print("== upsample+concat shapes ==")
    bench_ups(B, 32, 512, 256, 256)
    bench_ups(B, 64, 256, 128, 128)
    bench_ups(B, 128, 128, 64, 64)
    bench_ups(B, 128, 64, 32, 64)
