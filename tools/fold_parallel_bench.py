"""Fold-parallel CV wall-clock benchmark on the real TPU.

Times a 5-fold CrossValidator run at the reference's own scale
(resnet34, batch 4, 128x128, bce, aug=3 — the loss-sweep config,
loss_function_cross_validation.py:37-57) sequentially vs fold-parallel
(segtpu/eval/fold_parallel.py). Epoch count is FIXED (early stopping
disabled via an impossible patience) so both paths do identical work;
the reported ratio is the end-to-end CV wall-time win, which includes
both the stacked-dispatch compute win and the Kx reduction in per-epoch
host<->device fetches (~1 s RTT each through the relay).

Usage: python tools/fold_parallel_bench.py [epochs] [n_images] [modes]
``modes`` is a comma list of sequential/stream/vmap (default all).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = "/tmp/refscale_data"


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from segtpu.data.io import make_synthetic_dataset
    if not os.path.isdir(os.path.join(DATA_DIR, "GT_masks")):
        make_synthetic_dataset(DATA_DIR, n_images=n_images, image_type="W",
                               seed=7)

    from segtpu.eval import CrossValidator

    config = {
        "name": "bench", "backbone": "resnet34", "use_attention": False,
        "batch_size": 4, "img_size": (128, 128), "num_epochs": epochs,
        "learning_rate": 1e-3, "weight_decay": 1e-5, "loss_fn": "bce",
        "early_stopping_patience": 10_000,  # fixed-epoch comparison
        "early_stopping_min_delta": 0.0,
        "verbose": False, "save_plots": False, "seed": 0,
    }
    kw = dict(data_dir=DATA_DIR, image_type="W", n_splits=5,
              random_state=42, augmentations_per_image=3, verbose=False)

    wanted = (sys.argv[3].split(",") if len(sys.argv) > 3
              else ["sequential", "stream", "vmap"])
    out = {}
    modes = [("sequential", False, None), ("stream", True, "stream"),
             ("vmap", True, "vmap")]
    modes = [m for m in modes if m[0] in wanted]
    for mode, fp, strat in modes:
        cv = CrossValidator(fold_parallel=fp, **kw)
        cfg = dict(config)
        if strat:
            cfg["fold_parallel_strategy"] = strat
        # warm the compile caches with a 1-epoch pass, then time
        cv.cross_validate_single_model(config=dict(cfg, num_epochs=1))
        t0 = time.time()
        res = cv.cross_validate_single_model(config=cfg)
        dt = time.time() - t0
        out[mode] = {
            "secs": round(dt, 2),
            "iou_mean": round(res["cv_summary"]["iou_mean"], 4),
            "iou_std": round(res["cv_summary"]["iou_std"], 4),
        }
        print(f"{mode}: {dt:.1f}s  IoU {out[mode]['iou_mean']:.4f} "
              f"± {out[mode]['iou_std']:.4f}", flush=True)

    if "sequential" in out and "stream" in out:
        out["stream_speedup"] = round(out["sequential"]["secs"]
                                      / out["stream"]["secs"], 2)
    if "sequential" in out and "vmap" in out:
        out["vmap_speedup"] = round(out["sequential"]["secs"]
                                    / out["vmap"]["secs"], 2)
    out["epochs"] = epochs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
