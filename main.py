"""Experiment launcher — reference-compatible entry point.

``python main.py --experiment {augmentation_selection,augmentation_amount,
loss_function,model_configuration}`` (reference: main.py:20-37; note the
reference's own CLI imports a nonexistent package and cannot run — this one
works). Full implementation in segtpu/cli.py."""

from segtpu.cli import main

if __name__ == "__main__":
    main()
