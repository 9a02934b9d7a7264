"""Headline benchmark: segmentation inference throughput at 512×512.

Measures steady-state images/sec of the flagship model (resnet34 +
attention U-Net) on the available accelerator (TPU), and compares against
the reference-equivalent PyTorch model on this machine's CPU
(tools/torch_baseline.py) — the BASELINE.json metric
("images/sec/chip at 512x512 segmentation inference", north star ≥10×
reference CPU). The CPU baseline is measured once and cached in
BASELINE_LOCAL.json.

Outage resilience (the TPU is reached through a relay with observed
multi-hour outages, see CLAUDE.md): the relay is probed in a bounded
subprocess and retried for BENCH_RETRY_WINDOW seconds before giving up.
Every successful measurement is cached in BENCH_LAST_GOOD.json; if the
relay never comes back inside the window, the cached measurement is
emitted with ``"stale": true`` + its original timestamp so one outage
cannot zero a round's perf record.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SIZE = 512
BATCH = 128  # measured best throughput point on v5e (2020 img/s; see PERF.md)
WARMUP = 3
ITERS = 6
_HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(_HERE, "BASELINE_LOCAL.json")
LAST_GOOD = os.path.join(_HERE, "BENCH_LAST_GOOD.json")

# Relay-outage handling knobs (env-overridable).
PROBE_TIMEOUT = int(os.environ.get("BENCH_PROBE_TIMEOUT", "90"))
RETRY_INTERVAL = int(os.environ.get("BENCH_RETRY_INTERVAL", "120"))
RETRY_WINDOW = int(os.environ.get("BENCH_RETRY_WINDOW", "900"))
MEASURE_TIMEOUT = int(os.environ.get("BENCH_MEASURE_TIMEOUT", "1500"))


def measure_tpu_throughput():
    """Steady-state (images_per_sec, mfu_or_None) with tunnel-safe timing.

    On this rig the TPU is reached through a relay where
    ``block_until_ready`` does not actually synchronize and every
    ``device_get`` pays ~1s of fixed round-trip latency. We therefore time
    two runs of different iteration counts, each synced by a single scalar
    fetch, and fit out the fixed overhead:
        T(n) = overhead + n · t_batch  →  t_batch = (T(n2) − T(n1))/(n2 − n1)
    """
    import jax
    import jax.numpy as jnp
    from segtpu.models import UNetWithBackbone, create_model_state

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = UNetWithBackbone(backbone="resnet34", use_attention=True,
                             dtype=dtype)
    params, batch_stats = create_model_state(
        model, jax.random.key(0), (1, SIZE, SIZE, 1))

    @jax.jit
    def fwd(params, batch_stats, x):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    x = jax.random.normal(jax.random.key(1), (BATCH, SIZE, SIZE, 1),
                          jnp.float32)

    def run(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fwd(params, batch_stats, x)
        jax.device_get(out[0, 0, 0, 0])  # real sync (block_until_ready lies)
        return time.perf_counter() - t0

    run(WARMUP)  # compile + warm
    n1, n2 = ITERS, ITERS * 3
    fits = []
    for _ in range(3):
        t1 = min(run(n1), run(n1))
        t2 = min(run(n2), run(n2))
        fits.append(max((t2 - t1) / (n2 - n1), 1e-9))
    best = min(fits)
    # VERDICT r4 #4: a single best-fit point cannot distinguish relay
    # timing noise from a real regression — report the median and spread
    # of the three independent two-point fits alongside it.
    fits_ips = sorted(BATCH / t for t in fits)
    median_ips = fits_ips[1]
    spread_pct = 100.0 * (fits_ips[-1] - fits_ips[0]) / median_ips

    # MFU: XLA's own FLOP count for the compiled program / bf16 peak
    # (v5e nominal 197 TFLOP/s; the honest utilization metric VERDICT asked
    # bench.py to report alongside img/s).
    mfu = None
    try:
        cost = fwd.lower(params, batch_stats, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        peak = 197e12 if jax.default_backend() == "tpu" else None
        if peak and flops > 0:
            mfu = (flops / best) / peak
    except Exception as e:
        print(f"cost analysis unavailable: {e}", file=sys.stderr)
    return BATCH / best, mfu, {"median_ips": median_ips,
                               "spread_pct": spread_pct,
                               "fits_ips": fits_ips}


def get_cpu_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("size") == SIZE:
            return cached["cpu_images_per_sec"]
    sys.path.insert(0, os.path.join(_HERE, "tools"))
    from torch_baseline import measure_cpu_throughput
    val = measure_cpu_throughput(size=SIZE, batch=1, warmup=1, iters=2)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"size": SIZE, "cpu_images_per_sec": val,
                   "note": "reference-equivalent resnet34+attention U-Net, "
                           "torch CPU eval mode on this machine"}, f, indent=2)
    return val


def _probe_child() -> None:
    """Run in a subprocess: one bounded end-to-end relay round trip.

    A hung ``device_get`` cannot be interrupted in-process (the main
    thread blocks inside one C++ call, so SIGALRM never fires); the
    parent retries by launching fresh probe processes instead.
    """
    import threading
    t = threading.Timer(PROBE_TIMEOUT, lambda: os._exit(3))
    t.daemon = True
    t.start()
    import jax
    import jax.numpy as jnp
    jax.device_get(jnp.zeros(()) + 1.0)
    os._exit(0)


def wait_for_relay() -> bool:
    """Probe the relay in bounded subprocesses until it answers or the
    retry window closes. Returns True when a probe succeeded."""
    deadline = time.monotonic() + RETRY_WINDOW
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "BENCH_PROBE_CHILD": "1"},
                timeout=PROBE_TIMEOUT + 60,
                stdout=subprocess.DEVNULL).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            if attempt > 1:
                print(f"bench.py: relay back after {attempt} probes",
                      file=sys.stderr)
            return True
        if time.monotonic() >= deadline:
            return False
        print(f"bench.py: relay probe {attempt} failed (rc={rc}); "
              f"retrying in {RETRY_INTERVAL}s", file=sys.stderr)
        time.sleep(min(RETRY_INTERVAL, max(0.0, deadline - time.monotonic())))


def _emit_last_good_or_die(reason: str) -> None:
    """Final fallback: print the cached last-good measurement marked
    stale (exit 0) so the round still records a number with provenance,
    or exit 3 if no measurement has ever succeeded."""
    print(f"bench.py: {reason}", file=sys.stderr)
    if os.path.exists(LAST_GOOD):
        with open(LAST_GOOD) as f:
            cached = json.load(f)
        cached["stale"] = True
        cached["stale_reason"] = reason
        print(json.dumps(cached))
        sys.stdout.flush()
        os._exit(0)
    sys.stderr.flush()
    os._exit(3)


def main():
    if os.environ.get("BENCH_PROBE_CHILD"):
        _probe_child()
        return

    if not wait_for_relay():
        _emit_last_good_or_die(
            f"TPU/relay unresponsive for {RETRY_WINDOW}s of retries "
            "(tunnel down?)")

    # The relay can die again mid-measurement, hanging a device_get no
    # signal can interrupt — a daemon timer is the only escape hatch.
    import threading
    watchdog = threading.Timer(
        MEASURE_TIMEOUT,
        lambda: _emit_last_good_or_die(
            f"relay died mid-measurement (>{MEASURE_TIMEOUT}s)"))
    watchdog.daemon = True
    watchdog.start()

    value, mfu, stats = measure_tpu_throughput()
    try:
        baseline = get_cpu_baseline()
    except Exception as e:  # torch missing/failed — report absolute only
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline = None
    vs = (value / baseline) if baseline else None
    out = {
        "metric": "images/sec/chip at 512x512 segmentation inference "
                  "(resnet34+attention U-Net)",
        "value": round(value, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        # run-to-run variance of the three independent two-point fits:
        # lets a future round tell noise from regression (VERDICT r4 #4)
        "median": round(stats["median_ips"], 2),
        "spread_pct": round(stats["spread_pct"], 2),
        "fits": [round(v, 2) for v in stats["fits_ips"]],
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    watchdog.cancel()
    import jax
    if jax.default_backend() == "tpu":  # only cache real-chip numbers
        with open(LAST_GOOD, "w") as f:
            json.dump({**out, "measured_at": time.strftime(
                "%Y-%m-%dT%H:%M:%S%z")}, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
