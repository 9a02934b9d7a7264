"""One command from assets to verdict: absolute-IoU parity vs BASELINE.md.

The reference's headline numbers (BASELINE.md loss table; produced by
``/root/reference/loss_function_cross_validation.py:18-59,261-340``) were
trained from ImageNet-pretrained torchvision encoders on the real "W"
microscopy dataset — neither exists in this container. This script is the
drop-in validation for the day those assets arrive:

    python tools/validate_reference_parity.py \
        --data-dir /path/to/manual_labels \
        --checkpoint /path/to/resnet34-torchvision.pth

It runs the reference's EXACT loss-sweep protocol (10 loss configs,
resnet34 no-attention, bs=4, 128², 5-fold CV on an 80/20 split,
3 aug/img, seed 42, pretrained encoder) through segtpu's
``loss_comparison`` driver and prints a side-by-side table against
BASELINE.md with per-loss deltas and a parity verdict.

End-to-end testable without real assets (tests/test_validate_parity.py):
``--quick`` shrinks the protocol (2 folds, few epochs, loss subset) and
``make_fake_torchvision_checkpoint`` writes a randomly initialized
torchvision-layout resnet34 ``.pth`` so the whole pipeline — checkpoint
convert → encoder overlay → CV sweep → table — runs on the synthetic
fixture.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# BASELINE.md loss-function table (reference artifacts
# experiments/loss_comparison_20250616_204859_/cv_results_filtered.pth):
# name → (cv_iou_mean, cv_iou_std, cv_f1, test_iou, test_f1)
BASELINE_LOSS_TABLE = {
    "BCE Loss":                (0.8250, 0.0419, 0.9028, 0.7579, 0.8181),
    "Combo Loss":              (0.8243, 0.0393, 0.9025, 0.7375, 0.8057),
    "Focal Loss":              (0.8193, 0.0396, 0.8996, 0.7127, 0.7910),
    "Dice Loss":               (0.8164, 0.0376, 0.8977, 0.6769, 0.7656),
    "Focal Tversky":           (0.8145, 0.0520, 0.8966, 0.7261, 0.7987),
    "Weighted BCE":            (0.8003, 0.0474, 0.8881, 0.6862, 0.7745),
    "Tversky Loss":            (0.7980, 0.0329, 0.8865, 0.7368, 0.8054),
    "Log-Cosh Dice":           (0.7335, 0.1821, 0.8300, 0.6588, 0.7539),
    "Sensitivity-Specificity": (0.7300, 0.0718, 0.8418, 0.7147, 0.7917),
    "Balanced BCE":            (0.7161, 0.0704, 0.8287, 0.6851, 0.7737),
}

# Parity tolerance on CV IoU mean: the reference's own 5-fold std is
# 0.03-0.07 per loss; a different framework re-run of the same protocol
# lands within one fold-std of the published mean when it reproduces it.
PARITY_TOL = 0.05


def make_fake_torchvision_checkpoint(path: str, seed: int = 0) -> str:
    """Write a RANDOMLY initialized torchvision-resnet34-layout state_dict
    (same names/shapes torchvision publishes; advanced_models.py:73-88
    consumes these) so the full convert→overlay→train pipeline is
    exercisable without network access. Not pretrained — numbers from it
    validate plumbing, never accuracy."""
    import torch as T

    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = T.from_numpy(
            rng.normal(0, 0.05, (o, i, k, k)).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = T.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[name + ".bias"] = T.from_numpy(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[name + ".running_mean"] = T.from_numpy(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[name + ".running_var"] = T.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths, counts = (64, 128, 256, 512), (3, 4, 6, 3)
    cin = 64
    for li, (w, n) in enumerate(zip(widths, counts)):
        for bi in range(n):
            p = f"layer{li + 1}.{bi}"
            conv(f"{p}.conv1", w, cin if bi == 0 else w, 3)
            bn(f"{p}.bn1", w)
            conv(f"{p}.conv2", w, w, 3)
            bn(f"{p}.bn2", w)
            if bi == 0 and li > 0:
                conv(f"{p}.downsample.0", w, cin, 1)
                bn(f"{p}.downsample.1", w)
        cin = w
    T.save(sd, path)
    return path


def run(data_dir: str, checkpoint: str, image_type: str = "W",
        n_splits: int = 5, test_size: float = 0.2,
        augmentations_per_image: int = 3, seed: int = 42,
        save_root: str = "experiments_artifacts", quick: bool = False,
        fold_parallel: bool = False, base_overrides=None) -> dict:
    """Run the reference loss-sweep protocol and compare to BASELINE.md.

    Returns {"rows": [...], "verdict": "parity"|"divergent"|"plumbing-ok",
    "results": <loss_comparison.main result>}.
    """
    from segtpu.experiments import loss_comparison

    overrides = {"encoder_checkpoint": checkpoint, "verbose": False}
    overrides.update(base_overrides or {})
    loss_filter = None
    if quick:
        n_splits = min(n_splits, 2)
        overrides.setdefault("num_epochs", 2)
        overrides.setdefault("img_size", (64, 64))
        loss_filter = ["BCE Loss", "Combo Loss"]

    results = loss_comparison.main(
        data_dir=data_dir, image_type=image_type, n_splits=n_splits,
        test_size=test_size,
        augmentations_per_image=augmentations_per_image,
        random_state=seed, base_overrides=overrides, save_root=save_root,
        loss_filter=loss_filter, fold_parallel=fold_parallel)

    cv = results["cv_results"]["comparison_summary"]
    gen = results["generalization_results"]
    rows = []
    for name, (b_iou, b_std, b_f1, b_test_iou, b_test_f1) in \
            BASELINE_LOSS_TABLE.items():
        if name not in cv:
            continue
        got_iou = cv[name]["iou_mean"]
        got_std = cv[name]["iou_std"]
        got_f1 = cv[name]["f1_mean"]
        got_test = gen.get(name, {}).get("test_metrics", {}).get("iou")
        rows.append({
            "loss": name,
            "cv_iou": got_iou, "cv_iou_baseline": b_iou,
            "cv_iou_delta": got_iou - b_iou,
            "cv_std": got_std, "cv_std_baseline": b_std,
            "cv_f1": got_f1, "cv_f1_baseline": b_f1,
            "test_iou": got_test, "test_iou_baseline": b_test_iou,
            "within_tol": abs(got_iou - b_iou) <= PARITY_TOL,
        })

    print("\n" + "=" * 94)
    print("REFERENCE PARITY — segtpu loss sweep vs BASELINE.md "
          f"(tolerance ±{PARITY_TOL} CV IoU)")
    print("=" * 94)
    hdr = (f"{'Loss':<26}{'CV IoU':>9}{'ref':>9}{'Δ':>9}"
           f"{'CV F1':>9}{'ref':>7}{'Test IoU':>10}{'ref':>8}{'ok':>5}")
    print(hdr)
    print("-" * 94)
    for r in rows:
        test_s = f"{r['test_iou']:.4f}" if r["test_iou"] is not None \
            else "  -   "
        print(f"{r['loss']:<26}{r['cv_iou']:>9.4f}"
              f"{r['cv_iou_baseline']:>9.4f}{r['cv_iou_delta']:>+9.4f}"
              f"{r['cv_f1']:>9.4f}{r['cv_f1_baseline']:>7.4f}"
              f"{test_s:>10}{r['test_iou_baseline']:>8.4f}"
              f"{'YES' if r['within_tol'] else 'no':>5}")
    print("-" * 94)

    if quick:
        verdict = "plumbing-ok"
        print("VERDICT: plumbing-ok — quick mode ran the full pipeline "
              "(checkpoint convert → encoder overlay → CV sweep → table); "
              "absolute numbers are NOT meaningful on quick/synthetic "
              "inputs.")
    elif all(r["within_tol"] for r in rows):
        verdict = "parity"
        print(f"VERDICT: PARITY — every loss within ±{PARITY_TOL} CV IoU "
              "of BASELINE.md.")
    else:
        verdict = "divergent"
        bad = [r["loss"] for r in rows if not r["within_tol"]]
        print(f"VERDICT: DIVERGENT — outside tolerance: {', '.join(bad)}.")

    out = {"rows": rows, "verdict": verdict, "results": results}
    report = os.path.join(results["save_dir"], "parity_report.json")
    with open(report, "w") as f:
        json.dump({"rows": rows, "verdict": verdict,
                   "tolerance": PARITY_TOL}, f, indent=2)
    print(f"Report: {report}")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True,
                    help="microscopy tree (manual_labels layout: "
                         "*_GT.tif mask pairing)")
    ap.add_argument("--checkpoint", required=True,
                    help="torchvision resnet34 state_dict .pth "
                         "(ImageNet-pretrained for real validation)")
    ap.add_argument("--image-type", default="W", choices=["W", "B"])
    ap.add_argument("--n-splits", type=int, default=5)
    ap.add_argument("--test-size", type=float, default=0.2)
    ap.add_argument("--aug", type=int, default=3,
                    help="augmentations per image (reference: 3)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--save-root", default="experiments_artifacts")
    ap.add_argument("--quick", action="store_true",
                    help="pipeline smoke (2 folds, 2 epochs, 64², "
                         "loss subset) — validates plumbing only")
    ap.add_argument("--fold-parallel", action="store_true",
                    help="train each config's folds in parallel "
                         "(segtpu/eval/fold_parallel.py)")
    args = ap.parse_args(argv)
    out = run(args.data_dir, args.checkpoint, image_type=args.image_type,
              n_splits=args.n_splits, test_size=args.test_size,
              augmentations_per_image=args.aug, seed=args.seed,
              save_root=args.save_root, quick=args.quick,
              fold_parallel=args.fold_parallel)
    return 0 if out["verdict"] in ("parity", "plumbing-ok") else 1


if __name__ == "__main__":
    sys.exit(main())
