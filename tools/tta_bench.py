"""On-chip microbench: D4 TTA inference cost vs plain forward.

TTA runs 8 forwards inside one jitted program (segtpu/infer/tta.py), so
the expected cost is ~8× a plain forward minus scheduling overlap.
Measures both at the flagship shape with bench.py's two-point timing
(relay-safe: `block_until_ready` does not sync through the tunnel).

    python tools/tta_bench.py [--size 512] [--batch 16]

Writes nothing; prints a JSON line for PERF.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from segtpu.models import UNetWithBackbone, create_model_state
    from segtpu.infer.tta import tta_predict_proba

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = UNetWithBackbone(backbone="resnet34", use_attention=True,
                             dtype=dtype)
    params, batch_stats = create_model_state(
        model, jax.random.key(0), (1, args.size, args.size, 1))

    class _State:
        pass

    state = _State()
    state.params = params
    state.batch_stats = batch_stats

    @jax.jit
    def plain(x):
        return jax.nn.sigmoid(model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=False).astype(jnp.float32))

    x = jax.random.normal(jax.random.key(1),
                          (args.batch, args.size, args.size, 1), jnp.float32)

    def time_fn(fn):
        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(x)
            jax.device_get(out.ravel()[0])   # the only real sync here
            return time.perf_counter() - t0

        run(args.warmup)
        n1, n2 = args.iters, args.iters * 3
        best = None
        for _ in range(3):
            t1 = min(run(n1), run(n1))
            t2 = min(run(n2), run(n2))
            tb = max((t2 - t1) / (n2 - n1), 1e-9)
            best = tb if best is None else min(best, tb)
        return best

    t_plain = time_fn(plain)
    t_tta = time_fn(lambda v: tta_predict_proba(model, state, v))

    print(json.dumps({
        "size": args.size, "batch": args.batch,
        "backend": jax.default_backend(),
        "plain_ms": round(t_plain * 1e3, 2),
        "tta_ms": round(t_tta * 1e3, 2),
        "tta_over_plain": round(t_tta / t_plain, 2),
        "plain_img_per_s": round(args.batch / t_plain, 1),
        "tta_img_per_s": round(args.batch / t_tta, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
