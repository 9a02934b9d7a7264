"""Shared relay-safe two-point timing for the tools/ benchmarks.

Through the axon relay ``block_until_ready`` does not synchronize and each
``device_get`` pays ~1 s fixed RTT, so a single timed loop is useless. We
time two loops of different iteration counts, each synced once, and fit
out the fixed overhead: T(n) = overhead + n*t  ->  t = (T2-T1)/(n2-n1).

bench.py (the driver's headline benchmark) intentionally inlines its own
copy so it stays a standalone single file; keep the methodology in sync.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _default_sync(out):
    o = out[1]["loss"] if isinstance(out, tuple) else out
    jax.device_get(jnp.ravel(o)[0])


def two_point_time(fn, *args, iters=(3, 9), reps=2, sync=_default_sync
                   ) -> float:
    """Best-of-reps per-call seconds for ``fn(*args)`` (jitted)."""
    sync(fn(*args))  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        sync(o)
        return time.perf_counter() - t0

    n1, n2 = iters
    best = None
    for _ in range(reps):
        t1 = min(run(n1), run(n1))
        t2 = min(run(n2), run(n2))
        t = max((t2 - t1) / (n2 - n1), 1e-9)
        best = t if best is None else min(best, t)
    return best
