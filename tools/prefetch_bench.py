"""Cold-cache dataset load: double-buffered decode→resize pipeline vs
single-shot (VERDICT r2 #7 — overlap native decode with device compute).

Generates N LZW-compressed 1024² grayscale TIFF pairs (decode-heavy: the
native LZW path runs ~61 MPix/s on this host), clears the decode cache,
and times ``load_canonical`` with chunked double-buffering vs one batch.

Usage: python tools/prefetch_bench.py [--n 96] [--size 1024] [--chunk 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root: str, n: int, size: int) -> tuple:
    from PIL import Image
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    imgs, masks = [], []
    base = rng.integers(0, 200, (size, size), dtype=np.uint8)
    for i in range(n):
        # piecewise-constant-ish content so LZW actually compresses
        img = np.roll(base, i * 7, axis=0)
        msk = (img > 128).astype(np.uint8) * 255
        pi = os.path.join(root, f"img_{i:03d}.tif")
        pm = os.path.join(root, f"img_{i:03d}_GT.tif")
        Image.fromarray(img).save(pi, compression="tiff_lzw")
        Image.fromarray(msk).save(pm, compression="tiff_lzw")
        imgs.append(pi)
        masks.append(pm)
    return imgs, masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--img-size", type=int, default=256)
    args = ap.parse_args()

    import jax

    from segtpu.data.io import clear_decode_cache
    from segtpu.data.preprocess import load_canonical

    root = "/tmp/prefetch_bench_data"
    imgs, masks = make_dataset(root, args.n, args.size)
    out = (args.img_size, args.img_size)
    print(f"backend={jax.default_backend()} n={args.n} raw={args.size}² "
          f"→ {args.img_size}², chunk={args.chunk}", flush=True)

    # warm the resize compile (not what we're measuring)
    load_canonical(imgs[:2], masks[:2], out, chunk=None)

    results = {"single-shot": [], "pipelined": []}
    for rep in range(4):
        for label, chunk in (("single-shot", None),
                             ("pipelined", args.chunk)):
            clear_decode_cache()
            t0 = time.perf_counter()
            ci, cm = load_canonical(imgs, masks, out, chunk=chunk)
            dt = time.perf_counter() - t0
            results[label].append(dt)
            print(f"{label:11s}: {dt:6.2f} s  ({args.n / dt:6.1f} pairs/s)",
                  flush=True)
            assert ci.shape == (args.n, *out) and cm.shape == (args.n, *out)

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(f"median single-shot {med['single-shot']:.2f} s, "
          f"pipelined {med['pipelined']:.2f} s → "
          f"{med['single-shot'] / med['pipelined']:.2f}×", flush=True)


if __name__ == "__main__":
    main()
