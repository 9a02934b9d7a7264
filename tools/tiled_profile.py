"""Per-stage decomposition of tiled sliding-window inference (VERDICT r4 #3).

The r3/r4 record had one line for the tiled 2048² path (229 MPix/s
stream-batched) vs a dense rate of ~530 MPix/s, with the ~1.5× residual
(beyond the geometric halo redundancy) never attributed. This tool
decomposes it on the TPU with the relay-safe two-point fit:

  dense     : apply_fn on a (n_tiles, tile, tile, 1) batch — the pure
              model compute the tiled path must pay per image
  gather    : vmapped dynamic_slice tile extraction only
  blend     : the overlap-add scatter + normalization only (logits fed in)
  single    : the full make_tiled_predictor program, one image
  many      : make_tiled_predictor_many at --batch images (headline)

and prints the implied per-image budget vs measured. Also measures the
halo mode (read tile+2·halo, emit center crop, no blending) whose
compute redundancy at 2048²/512/64 is 1.27× vs blend's 1.56×.

Usage: python tools/tiled_profile.py [--size 2048 --tile 512 --overlap 64
                                      --batch 8] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import two_point_time


def _sync(o):
    jax.device_get(jnp.ravel(o)[0])


def _t(fn, *args, iters=(2, 6)):
    return two_point_time(fn, *args, iters=iters, sync=_sync)


def build_apply(backbone="resnet34", attention=True, dtype="bfloat16"):
    from segtpu.models import UNetWithBackbone, create_model_state
    model = UNetWithBackbone(backbone=backbone, use_attention=attention,
                             dtype=dtype)
    params, bs = create_model_state(model, jax.random.key(0), (1, 64, 64, 1))

    def apply_fn(x):
        return model.apply({"params": params, "batch_stats": bs}, x,
                           train=False)

    return apply_fn


def sweep(args, make_tiled_predictor_many, _tile_origins):
    """Halo-mode tile-size sweep: one shared model build, stream-batched
    headline per (tile, overlap) config. tile == size with overlap 0 is
    the dense whole-image datapoint (redundancy 1.0)."""
    S, B = args.size, args.batch
    configs = []
    for spec in args.sweep.split(","):
        t, v = spec.strip().split(":")
        configs.append((int(t), int(v)))
    apply_fn = (lambda x: x * 2.0) if args.quick else build_apply()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, S, S, 1), np.float32))
    mpix = S * S / 1e6
    report = {"config": vars(args), "mode": "halo", "results": []}
    for T, V in configs:
        halo = V // 2
        if T % 32 == 0 and halo:
            halo = -(-halo // 16) * 16
        n_tiles = (-(-S // T)) ** 2
        red = n_tiles * (T + 2 * halo) ** 2 / (S * S)
        many = make_tiled_predictor_many(apply_fn, tile=T, overlap=V,
                                         batch_tiles=None, mode="halo")
        t_many = _t(many, imgs, iters=(1, 3))
        rate = mpix * B / t_many
        row = {"tile": T, "overlap": V, "halo": halo, "n_tiles": n_tiles,
               "redundancy": red, "s_per_img": t_many / B,
               "mpix_per_s": rate}
        report["results"].append(row)
        print(f"tile {T:4} ov {V:3} (halo {halo:2}, {n_tiles:2} tiles, "
              f"{red:.3f}x): {t_many/B*1e3:7.2f} ms/img  {rate:6.0f} MPix/s",
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report: {args.out}")
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quick", action="store_true",
                    help="identity apply_fn (no model) — blend/gather only")
    ap.add_argument("--sweep", default=None,
                    help="tile:overlap list, e.g. '512:32,1024:32,2048:0' — "
                         "halo-mode stream-batched headline per config, one "
                         "shared model build (skips the per-stage decompose)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from segtpu.infer.tiled import (_blend_window, _tile_origins,
                                    make_tiled_predictor,
                                    make_tiled_predictor_many)

    if args.sweep:
        return sweep(args, make_tiled_predictor_many, _tile_origins)

    S, T, V, B = args.size, args.tile, args.overlap, args.batch
    stride = T - V
    org1 = _tile_origins(S, T, stride)
    n_tiles = len(org1) ** 2
    mpix = S * S / 1e6
    redundancy = n_tiles * T * T / (S * S)
    halo = V // 2
    if T % 32 == 0 and halo:  # same stride alignment as make_tiled_predictor
        halo = -(-halo // 16) * 16
    n_halo = (-(-S // T)) ** 2
    red_halo = n_halo * (T + 2 * halo) ** 2 / (S * S)
    print(f"{S}² tile {T} overlap {V}: {n_tiles} tiles/img, "
          f"blend redundancy {redundancy:.3f}×; halo {halo}: {n_halo} tiles, "
          f"{red_halo:.3f}×")

    apply_fn = ((lambda x: x * 2.0) if args.quick
                else build_apply())

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((S, S, 1), np.float32))
    imgs = jnp.asarray(rng.random((B, S, S, 1), np.float32))
    report = {"config": vars(args), "n_tiles": n_tiles,
              "redundancy_blend": redundancy, "redundancy_halo": red_halo}

    # -- stage: dense model compute on exactly the tile batch the blend
    #    path runs per image
    if not args.quick:
        tiles = jnp.asarray(rng.random((n_tiles, T, T, 1), np.float32))
        t_dense = _t(jax.jit(apply_fn), tiles)
        report["dense_tilebatch_s"] = t_dense
        print(f"dense forward, ({n_tiles},{T},{T}) batch: "
              f"{t_dense*1e3:8.2f} ms  "
              f"({n_tiles*T*T/1e6/t_dense:6.0f} MPix/s raw tiles)")

    # -- stage: gather only
    orgs = np.stack(np.meshgrid(org1, org1, indexing="ij"),
                    axis=-1).reshape(-1, 2)
    orgs_d = jnp.asarray(orgs)

    @jax.jit
    def gather(image, o):
        return jax.vmap(lambda oo: jax.lax.dynamic_slice(
            image, (oo[0], oo[1], 0), (T, T, 1)))(o)

    t_gather = _t(gather, img, orgs_d)
    report["gather_s"] = t_gather
    print(f"tile gather ({n_tiles} tiles):      {t_gather*1e3:8.2f} ms")

    # -- stage: blend scatter + normalize only (current in-predictor form:
    #    sequential scan of slice+add+update over tiles)
    window = jnp.asarray(_blend_window(T, V))
    logits = jnp.asarray(rng.random((n_tiles, T, T, 1), np.float32))

    @jax.jit
    def blend(o, lg):
        acc = jnp.zeros((S, S, 1), jnp.float32)
        wacc = jnp.zeros((S, S, 1), jnp.float32)

        def put(carry, args_):
            acc, wacc = carry
            oo, l = args_
            wt = window[:, :, None]
            patch = jax.lax.dynamic_slice(acc, (oo[0], oo[1], 0), (T, T, 1))
            wpatch = jax.lax.dynamic_slice(wacc, (oo[0], oo[1], 0), (T, T, 1))
            acc = jax.lax.dynamic_update_slice(acc, patch + l * wt,
                                               (oo[0], oo[1], 0))
            wacc = jax.lax.dynamic_update_slice(wacc, wpatch + wt,
                                                (oo[0], oo[1], 0))
            return (acc, wacc), None

        (acc, wacc), _ = jax.lax.scan(put, (acc, wacc), (o, lg))
        return acc / jnp.maximum(wacc, 1e-8)

    t_blend = _t(blend, orgs_d, logits)
    report["blend_scan_s"] = t_blend
    print(f"blend scatter (scan, acc+wacc):  {t_blend*1e3:8.2f} ms")

    # -- full predictors
    for mode in ("blend", "halo"):
        single = make_tiled_predictor(apply_fn, tile=T, overlap=V,
                                      batch_tiles=32, mode=mode)
        t_single = _t(single, img)
        report[f"single_{mode}_s"] = t_single
        print(f"single-image tiled [{mode:5}]:    {t_single*1e3:8.2f} ms  "
              f"({mpix/t_single:6.0f} MPix/s)")

        many = make_tiled_predictor_many(apply_fn, tile=T, overlap=V,
                                         batch_tiles=32, mode=mode)
        t_many = _t(many, imgs, iters=(1, 3))
        report[f"many_{mode}_s_per_img"] = t_many / B
        print(f"stream-batched B={B} [{mode:5}]:    {t_many/B*1e3:8.2f} "
              f"ms/img ({mpix*B/t_many:6.0f} MPix/s)")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report: {args.out}")
    return report


if __name__ == "__main__":
    main()
