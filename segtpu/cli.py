"""Experiment launcher CLI.

Reference parity: main.py:20-37 — same four ``--experiment`` choices (the
reference's CLI is actually broken as shipped, importing a nonexistent
``cell_segmentation`` package, main.py:5-17 / SURVEY.md §1; this one works).

Extra flags: --data-dir, --image-type, --quick (small fixture-scale run for
smoke testing on limited hardware), --fold-parallel (advance all of a CV's
fold trainings together via async per-fold epoch dispatch with one batched
metric fetch per epoch, segtpu/eval/fold_parallel.py).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Cell Segmentation Experiment Launcher (TPU-native)")
    parser.add_argument(
        "--experiment", type=str, required=True,
        choices=["augmentation_selection", "augmentation_amount",
                 "loss_function", "model_configuration"],
        help="Which experiment to run")
    parser.add_argument("--data-dir", type=str, default="manual_labels")
    parser.add_argument("--image-type", type=str, default="W",
                        choices=["W", "B"])
    parser.add_argument("--quick", action="store_true",
                        help="Reduced epochs/folds smoke-scale run")
    parser.add_argument("--save-root", type=str, default="experiments")
    parser.add_argument("--fold-parallel", action="store_true",
                        help="Train CV folds simultaneously as one stacked "
                             "vmapped device program")
    args = parser.parse_args(argv)

    quick_overrides = {"num_epochs": 3, "n_splits": 2} if args.quick else {}
    if args.fold_parallel:
        quick_overrides["fold_parallel"] = True

    if args.experiment == "augmentation_selection":
        from segtpu.experiments.forward_selection import (
            run_augmentation_selection_experiment)
        run_augmentation_selection_experiment(
            data_dir=args.data_dir,
            config_overrides={"image_type": args.image_type,
                              "fold_parallel": args.fold_parallel,
                              **({"num_epochs": 3} if args.quick else {})},
            cv_folds=2 if args.quick else 5,
            max_augmentations=2 if args.quick else 10,
            quick_evaluation=args.quick,
            save_root=args.save_root)
    elif args.experiment == "augmentation_amount":
        from segtpu.experiments.augmentation_amount import main as aug_main
        aug_main(data_dir=args.data_dir, image_type=args.image_type,
                 augmentation_amounts=[0, 1, 2] if args.quick else None,
                 base_overrides=quick_overrides, save_root=args.save_root)
    elif args.experiment == "loss_function":
        from segtpu.experiments.loss_comparison import main as loss_main
        loss_main(data_dir=args.data_dir, image_type=args.image_type,
                  n_splits=2 if args.quick else 5,
                  base_overrides=quick_overrides or None,
                  save_root=args.save_root,
                  fold_parallel=args.fold_parallel)
    elif args.experiment == "model_configuration":
        from segtpu.experiments.model_configuration import main as mc_main
        mc_main(data_dir=args.data_dir, image_type=args.image_type,
                configuration_options=(
                    {"backbone": ["resnet34"], "use_attention": [True, False],
                     "batch_size": [4]} if args.quick else None),
                base_overrides=quick_overrides or None,
                save_root=args.save_root)
    else:  # pragma: no cover
        print("Unknown experiment. Use --help for options.")
        sys.exit(1)


if __name__ == "__main__":
    main()
