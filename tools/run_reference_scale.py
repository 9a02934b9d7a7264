"""Reference-scale experiment runs on the real TPU (VERDICT round-1 #5).

Runs the three CV experiment drivers at the reference's own budgets
(5-fold, 50-epoch defaults; full config grid; aug-amount grid subsampled
from the reference's ``range(1, 51)`` sweep to bracket its measured knee
at ~9 aug/img) on a fixed synthetic dataset, saving artifacts under
``experiments_artifacts/``. Each phase is independent: a failure in one
does not stop the next, and CV itself checkpoints per fold (resumable).

Usage: python tools/run_reference_scale.py [phase ...]
  phases: loss, config, aug   (default: all three, in that order)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAVE_ROOT = os.path.join(REPO, "experiments_artifacts")
DATA_DIR = "/tmp/refscale_data"

# The reference sweeps range(1, 51) (augmentation_amount_experiment
# .py:389). Full grid = ~6x this compute for the same curve shape; this
# subsample is dense around the published knee (~9) and samples the tail.
AUG_GRID = [1, 3, 5, 7, 9, 12, 15, 20, 30, 40, 50]


def _dataset() -> str:
    from segtpu.data.io import make_synthetic_dataset
    if not os.path.isdir(os.path.join(DATA_DIR, "GT_masks")):
        make_synthetic_dataset(DATA_DIR, n_images=30, image_type="W",
                               seed=7)
    return DATA_DIR


def run_loss():
    from segtpu.experiments import loss_comparison
    return loss_comparison.main(data_dir=_dataset(), image_type="W",
                                save_root=SAVE_ROOT)


def run_config():
    from segtpu.experiments import model_configuration
    return model_configuration.main(
        data_dir=_dataset(), image_type="W", save_root=SAVE_ROOT,
        base_overrides={"verbose": False})


def run_aug():
    from segtpu.experiments import augmentation_amount
    return augmentation_amount.main(
        data_dir=_dataset(), image_type="W", save_root=SAVE_ROOT,
        augmentation_amounts=AUG_GRID)


PHASES = {"loss": run_loss, "config": run_config, "aug": run_aug}


def main():
    which = sys.argv[1:] or ["loss", "config", "aug"]
    status = {}
    for name in which:
        t0 = time.time()
        print(f"\n{'#'*70}\n# reference-scale phase: {name}\n{'#'*70}",
              flush=True)
        try:
            PHASES[name]()
            status[name] = {"ok": True, "secs": round(time.time() - t0, 1)}
        except Exception as e:
            traceback.print_exc()
            status[name] = {"ok": False, "error": repr(e),
                            "secs": round(time.time() - t0, 1)}
        print(f"# phase {name}: {status[name]}", flush=True)
    with open(os.path.join(SAVE_ROOT, "reference_scale_status.json"),
              "w") as f:
        json.dump(status, f, indent=2)
    print(json.dumps(status))


if __name__ == "__main__":
    main()
