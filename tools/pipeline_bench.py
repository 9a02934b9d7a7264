"""Epoch-pipelining wall-clock benchmark on the real TPU.

Measures the controller-horizon windowed dispatch (train_model
`pipeline_epochs`, segtpu/train/loop.py; same mechanism in the
fold-parallel stream loop) at the reference's own training scale
(resnet34, batch 4, 128x128, 40 images + 3 aug/img — the protocol of
train.py:301-364). Through the axon relay every metric fetch costs ~1 s
of round-trip latency, so the per-epoch fetch dominates small-epoch
trainings; the window divides that bill by up to `pipeline_epochs` with
bit-identical numerics (tests/test_epoch_pipeline.py).

Usage: python tools/pipeline_bench.py [epochs] [n_images]
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
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from segtpu.data.io import make_synthetic_dataset
    if not os.path.isdir(os.path.join(DATA_DIR, "GT_masks")):
        make_synthetic_dataset(DATA_DIR, n_images=n_images, image_type="W",
                               seed=7)
    from segtpu.data.discovery import load_original_data
    from segtpu.train.loop import train_model
    from segtpu.train.optim import ReduceLROnPlateau

    data = load_original_data(DATA_DIR, "W")
    ip, mp = data["image_paths"], data["mask_paths"]
    n_tr = max(4, int(len(ip) * 0.8))

    base_cfg = {
        "backbone": "resnet34", "use_attention": False, "batch_size": 4,
        "img_size": (128, 128), "learning_rate": 1e-3, "weight_decay": 1e-5,
        "loss_fn": "combo", "verbose": False, "save_plots": False, "seed": 0,
        "early_stopping_patience": 10_000,  # fixed-epoch comparison
        "early_stopping_min_delta": 0.0,
    }

    def run(pipeline: int, num_epochs: int):
        cfg = dict(base_cfg, pipeline_epochs=pipeline)
        sched = ReduceLROnPlateau(initial_lr=1e-3, mode="max", factor=0.5,
                                  patience=3, threshold=1e-4, min_lr=1e-6)
        t0 = time.time()
        res = train_model(
            train_images=ip[:n_tr], train_masks=mp[:n_tr],
            val_images=ip[n_tr:], val_masks=mp[n_tr:],
            scheduler=sched, num_epochs=num_epochs, config=cfg,
            augmentations_per_image=3, save_plots=False)
        return time.time() - t0, res

    out = {"epochs": epochs}
    run(1, 1)  # warm compile caches (all programs identical across modes)
    for pipeline in (1, 2, 4, 8):
        best = None
        for _ in range(2):
            dt, res = run(pipeline, epochs)
            best = dt if best is None else min(best, dt)
        out[f"p{pipeline}"] = {
            "secs": round(best, 2),
            "s_per_epoch": round(best / epochs, 3),
            "final_iou": round(res["final_val_metrics"]["iou"], 4),
        }
        print(f"pipeline={pipeline}: {best:.1f}s "
              f"({best/epochs:.2f} s/epoch), "
              f"IoU {out[f'p{pipeline}']['final_iou']:.4f}", flush=True)

    out["speedup_p4"] = round(out["p1"]["secs"] / out["p4"]["secs"], 2)
    out["speedup_p8"] = round(out["p1"]["secs"] / out["p8"]["secs"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
