"""Per-transform throughput of the on-device augmentation pipeline
(VERDICT r2 #5: 643 img/s at 128²/bs256 for the 4-transform production
pipeline vs 8021 img/s for the full train step — find the sink).

Usage: python tools/augment_bench.py [--batch 256] [--size 128]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()
    B, S = args.batch, args.size

    from segtpu.data import augment as A

    print(f"backend={jax.default_backend()} batch={B} size={S}", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (B, S, S)), jnp.uint8)
    msk = jnp.asarray(rng.integers(0, 2, (B, S, S)), jnp.uint8)
    key = jax.random.key(0)

    # full production pipeline
    pipe = A._production_pipeline()
    fn = pipe.batch_fn()
    t = two_point_time(fn, img, msk, jax.random.split(key, B),
                       sync=lambda o: jax.device_get(jnp.ravel(o[0])[0]))
    print(f"production 4-transform: {t*1e3:8.2f} ms  ({B/t:7.0f} img/s)",
          flush=True)

    # each production transform alone
    for name in ("random_rotate_90", "affine", "vertical_flip",
                 "advanced_blur", "grid_distortion", "optical_distortion",
                 "gauss_noise", "random_gamma"):
        p = A.Pipeline([(A.AUGMENTATION_CANDIDATES[name], 1.0)])
        f = p.batch_fn()
        t = two_point_time(f, img, msk, jax.random.split(key, B),
                           sync=lambda o: jax.device_get(jnp.ravel(o[0])[0]))
        print(f"{name:20s}: {t*1e3:8.2f} ms  ({B/t:7.0f} img/s)", flush=True)

    # identity (u8->f32->u8 round trip + prob gating overhead)
    p0 = A.Pipeline([])
    f0 = p0.batch_fn()
    t = two_point_time(f0, img, msk, jax.random.split(key, B),
                       sync=lambda o: jax.device_get(jnp.ravel(o[0])[0]))
    print(f"{'identity':20s}: {t*1e3:8.2f} ms  ({B/t:7.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
