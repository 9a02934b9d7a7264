"""Training-side throughput + roofline at 512x512 (VERDICT round-1 #8).

Measures steady-state img/s of the jitted train step (value_and_grad +
Adam + on-device metrics) at several batch sizes, the grad-accumulation
step at effective batches beyond single-forward HBM, and prints XLA's own
cost analysis (flops, bytes accessed) per step for the bytes/FLOP story.

Two-point relay-safe timing (see bench.py).

Usage: python tools/train_bench.py [--size 512] [--batches 8,16,32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import two_point_time


def timed(fn, *args, iters=(3, 9), reps=2):
    return two_point_time(fn, *args, iters=iters, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", type=str, default="8,16,32")
    ap.add_argument("--accum", type=str, default="4x32,8x32",
                    help="AxB micro-batch configs for the accum step")
    ap.add_argument("--remat", type=str, default="none",
                    choices=["none", "full"])
    args = ap.parse_args()
    s = args.size

    from segtpu.train.engine import get_engine

    eng = get_engine({"backbone": "resnet34", "use_attention": True,
                      "loss_fn": "combo", "dtype": "bfloat16",
                      "remat": args.remat})
    state = eng.init_state(jax.random.key(0), (1, s, s, 1),
                           learning_rate=1e-3, weight_decay=1e-5)

    print(f"train step roofline at {s}x{s} (resnet34+attention, bf16, remat={args.remat})")
    for b in [int(x) for x in args.batches.split(",")]:
        imgs = jax.random.uniform(jax.random.key(1), (b, s, s, 1))
        masks = (imgs > 0.5).astype(jnp.float32)
        t = timed(eng._train_step, state, imgs, masks)
        line = f"  bs{b:<4} {t*1e3:8.2f} ms  {b/t:8.1f} img/s"
        try:
            cost = eng._train_step.lower(state, imgs, masks).compile() \
                .cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            fl = float(cost.get("flops", 0))
            by = float(cost.get("bytes accessed", 0))
            if fl:
                line += (f"  {fl/t/1e12:6.1f} TF/s ({fl/t/197e12*100:4.1f}% "
                         f"MFU)  {by/1e9:6.2f} GB/step "
                         f"({by/t/1e9:5.0f} GB/s)  {fl/by:5.0f} FLOP/B")
        except Exception:
            pass
        print(line, flush=True)

    for spec in args.accum.split(","):
        a, b = (int(x) for x in spec.split("x"))
        imgs = jax.random.uniform(jax.random.key(2), (a, b, s, s, 1))
        masks = (imgs > 0.5).astype(jnp.float32)
        t = timed(eng._train_step_accum, state, imgs, masks)
        print(f"  accum {a}x{b} (eff bs{a*b}) {t*1e3:8.2f} ms  "
              f"{a*b/t:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
