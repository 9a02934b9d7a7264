"""Guarded on-chip microbench of the fused decoder-block Pallas kernel.

VERDICT r3 #3: `segtpu/kernels/fused_block.py` (conv3x3+BN+ReLU ×2 with
the intermediate kept in VMEM) is interpret-verified but was never
measured on the chip — Mosaic remote-compile 500s blocked it in round 3.
This script runs the one measurement that closes the axis, with the full
rig-safety protocol:

1. bounded subprocess probe of the relay first (a hung device_get cannot
   be interrupted in-process — bench.py pattern);
2. the Pallas compile+run itself in a BOUNDED SUBPROCESS per shape, so a
   Mosaic crash or relay death costs one child, not the session;
3. XLA reference timed in-process afterwards (known-safe path).

Shapes: the resnet34 U-Net decoder pairs at the 512² flagship
(concat-in → dec-out per level, segtpu/models/unet.py _DECODER_PLAN).

Usage: python tools/fused_block_bench.py [--bs 8] [--shape-timeout 420]
Each child prints one JSON line; the parent prints the comparison table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (H, Cin, Cout): 512² flagship decoder conv pairs, level 0..3
SHAPES = [(32, 512, 256), (64, 256, 128), (128, 128, 64), (256, 96, 32)]


def _timeit(fn, *args, n1=5, n2=20):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = f(*args)
        jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    t1 = min(run(n1), run(n1))
    t2 = min(run(n2), run(n2))
    return (t2 - t1) / (n2 - n1)


def child_one_shape(bs: int, h: int, cin: int, cout: int,
                    which: str) -> None:
    """Run ONE implementation at ONE shape; print a JSON line; exit."""
    import threading
    hard_timeout = int(os.environ.get("FBB_CHILD_TIMEOUT", "360"))
    t = threading.Timer(hard_timeout, lambda: os._exit(5))
    t.daemon = True
    t.start()

    import jax
    import jax.numpy as jnp
    from segtpu.kernels.fused_block import (conv_pair_bn_relu_pallas,
                                            conv_pair_bn_relu_xla)

    k = jax.random.key(0)
    dt = jnp.bfloat16
    x = jax.random.normal(k, (bs, h, h, cin), dt)
    w1 = jax.random.normal(k, (3, 3, cin, cout), dt) * 0.05
    w2 = jax.random.normal(k, (3, 3, cout, cout), dt) * 0.05
    s = jnp.ones((cout,), jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)

    if which == "pallas":
        fn = lambda *a: conv_pair_bn_relu_pallas(*a, tile=32)
    else:
        fn = conv_pair_bn_relu_xla
    sec = _timeit(fn, x, w1, s, b, w2, s, b)

    # correctness spot check (pallas child only; tolerances as in
    # tests/test_kernels.py interpret-mode parity)
    max_err = None
    if which == "pallas":
        import numpy as np
        ref = jax.device_get(conv_pair_bn_relu_xla(x, w1, s, b, w2, s, b)
                             .astype(jnp.float32))
        got = jax.device_get(fn(x, w1, s, b, w2, s, b)
                             .astype(jnp.float32))
        denom = max(1e-3, float(np.abs(ref).max()))
        max_err = float(np.abs(got - ref).max() / denom)

    print(json.dumps({"which": which, "h": h, "cin": cin, "cout": cout,
                      "ms": sec * 1e3, "rel_err": max_err}))
    sys.stdout.flush()
    os._exit(0)


def probe_relay(timeout: int = 120) -> bool:
    code = ("import threading,os;"
            f"t=threading.Timer({timeout}, lambda: os._exit(3));"
            "t.daemon=True;t.start();"
            "import jax,jax.numpy as jnp;"
            "jax.device_get(jnp.zeros(())+1.0);os._exit(0)")
    try:
        rc = subprocess.run([sys.executable, "-c", code],
                            timeout=timeout + 60).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    return rc == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--shape-timeout", type=int, default=420,
                    help="subprocess budget per (shape, impl)")
    ap.add_argument("--child", nargs=5, default=None,
                    help=argparse.SUPPRESS)  # bs h cin cout which
    args = ap.parse_args()

    if args.child:
        bs, h, cin, cout = map(int, args.child[:4])
        child_one_shape(bs, h, cin, cout, args.child[4])
        return

    if not probe_relay():
        print("fused_block_bench: relay unresponsive — aborting before "
              "any kernel touches the chip", file=sys.stderr)
        sys.exit(3)

    rows = []
    for h, cin, cout in SHAPES:
        row = {"h": h, "cin": cin, "cout": cout}
        for which in ("xla", "pallas"):
            env = {**os.environ,
                   "FBB_CHILD_TIMEOUT": str(args.shape_timeout - 30)}
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     str(args.bs), str(h), str(cin), str(cout), which],
                    capture_output=True, text=True,
                    timeout=args.shape_timeout, env=env)
                line = (r.stdout.strip().splitlines() or [""])[-1]
                rec = json.loads(line) if line.startswith("{") else None
            except (subprocess.TimeoutExpired, json.JSONDecodeError):
                rec = None
            if rec is None:
                row[which] = None
                print(f"  {which} b{args.bs} {h}x{h} {cin}->{cout}: "
                      f"FAILED (rc={getattr(r, 'returncode', 'timeout')}; "
                      f"stderr tail: "
                      f"{getattr(r, 'stderr', '')[-200:]!r})")
            else:
                row[which] = rec
                err = (f" rel_err={rec['rel_err']:.2e}"
                       if rec.get("rel_err") is not None else "")
                print(f"  {which} b{args.bs} {h}x{h} {cin}->{cout}: "
                      f"{rec['ms']:.3f} ms{err}")
            # re-probe between children: a crashed Mosaic compile can
            # take the relay down for everyone after it
            if not probe_relay():
                print("fused_block_bench: relay died after this child — "
                      "stopping", file=sys.stderr)
                rows.append(row)
                _summary(rows, args.bs)
                sys.exit(4)
        rows.append(row)
    _summary(rows, args.bs)


def _summary(rows, bs):
    print(f"\nfused decoder pair, bs={bs}, bf16, tile=32")
    print(f"{'shape':<22}{'XLA ms':>9}{'Pallas ms':>11}{'ratio':>8}")
    for row in rows:
        sh = f"{row['h']}x{row['h']} {row['cin']}->{row['cout']}"
        x = row.get("xla")
        p = row.get("pallas")
        xs = f"{x['ms']:.3f}" if x else "fail"
        ps = f"{p['ms']:.3f}" if p else "fail"
        ratio = f"{p['ms'] / x['ms']:.2f}x" if (x and p) else "-"
        print(f"{sh:<22}{xs:>9}{ps:>11}{ratio:>8}")
    with open(os.path.join(REPO, "FUSED_BLOCK_BENCH.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
