"""String-keyed loss registry with per-loss hyperparameters from config.

Reference parity: losses.py:345-403 — same keys, same config hyperparameter
names and defaults, same fallback behavior (unknown name → warn + ComboLoss).
``get_loss_function`` returns a pure callable ``loss(logits, targets)``
suitable for closure into a jit-compiled train step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

from segtpu.losses import functional as F


def _named(fn: Callable, name: str) -> Callable:
    fn.name = name
    return fn


def get_loss_function(config: Dict) -> Callable:
    """Initialize the appropriate loss function based on config
    (losses.py:345-403)."""
    config = config or {}
    loss_name = config.get("loss_fn", "combo")

    loss_functions = {
        "dice": lambda: partial(F.dice_loss, smooth=config.get("smooth", 1.0)),
        "bce": lambda: F.bce_loss,
        "weighted_bce": lambda: partial(
            F.weighted_bce_loss, beta=config.get("beta", 2.0)),
        "balanced_bce": lambda: F.balanced_bce_loss,
        "focal": lambda: partial(
            F.focal_loss,
            alpha=config.get("focal_alpha", 0.25),
            gamma=config.get("focal_gamma", 2.0)),
        "combo": lambda: partial(
            F.combo_loss, alpha=config.get("loss_alpha", 0.5)),
        "triple_combo": lambda: partial(
            F.triple_combo_loss,
            alpha_dice=config.get("alpha_dice", 0.33),
            alpha_bce=config.get("alpha_bce", 0.33),
            alpha_focal=config.get("alpha_focal", 0.34),
            focal_alpha=config.get("focal_alpha", 0.25),
            gamma=config.get("focal_gamma", 2.0)),
        "tversky": lambda: partial(
            F.tversky_loss,
            alpha=config.get("tversky_alpha", 0.5),
            beta=config.get("tversky_beta", 0.5)),
        "tversky_balanced": lambda: partial(F.tversky_loss, alpha=0.5, beta=0.5),
        "tversky_recall": lambda: partial(F.tversky_loss, alpha=0.3, beta=0.7),
        "focal_tversky": lambda: partial(
            F.focal_tversky_loss,
            alpha=config.get("tversky_alpha", 0.5),
            beta=config.get("tversky_beta", 0.5),
            gamma=config.get("focal_tversky_gamma", 0.75)),
        "sensitivity_specificity": lambda: partial(
            F.sensitivity_specificity_loss,
            w=config.get("sensitivity_weight", 0.5)),
        "log_cosh_dice": lambda: partial(
            F.log_cosh_dice_loss, smooth=config.get("smooth", 1.0)),
        "exponential_logarithmic": lambda: partial(
            F.exponential_logarithmic_loss,
            w_dice=config.get("w_dice", 0.5),
            w_cross=config.get("w_cross", 0.5),
            gamma_dice=config.get("gamma_dice", 0.3),
            gamma_cross=config.get("gamma_cross", 0.3)),
        "distance_map_bce": lambda: partial(
            F.distance_map_bce_loss, alpha=config.get("distance_alpha", 1.0)),
        "hausdorff": lambda: partial(
            F.hausdorff_loss, alpha=config.get("hausdorff_alpha", 2.0)),
        "boundary": lambda: partial(
            F.boundary_loss,
            theta0=config.get("boundary_theta0", 3),
            theta=config.get("boundary_theta", 5)),
    }

    if loss_name in loss_functions:
        return _named(loss_functions[loss_name](), loss_name)
    print(f"Warning: Unknown loss function '{loss_name}', defaulting to ComboLoss")
    return _named(partial(F.combo_loss, alpha=config.get("loss_alpha", 0.5)), "combo")


def available_losses():
    """Registry keys (losses.py:485-490 plus the tversky presets)."""
    return [
        "dice", "bce", "weighted_bce", "balanced_bce", "focal",
        "tversky", "tversky_balanced", "tversky_recall", "focal_tversky",
        "sensitivity_specificity", "log_cosh_dice", "combo", "triple_combo",
        "exponential_logarithmic", "distance_map_bce", "hausdorff", "boundary",
    ]


LOSS_FUNCTION_GUIDE = """
Loss Function Selection Guide:
=============================

1. Binary Cross-Entropy (BCE): balanced datasets, general purpose.
2. Weighted BCE: skewed datasets; tune beta.
3. Balanced BCE: automatic class-imbalance handling.
4. Focal Loss: highly imbalanced datasets, hard examples.
5. Dice Loss: directly optimizes an IoU-like metric.
6. Tversky Loss: control the FP/FN trade-off via alpha/beta.
7. Focal Tversky: small ROIs with high imbalance.
8. Sensitivity-Specificity: control the TP/TN trade-off.
9. Log-Cosh Dice: smooth Dice optimization.
10. Combo (Dice + BCE): general-purpose default.
11. Exponential Logarithmic: focuses on poorly predicted regions.
12. Distance Map BCE: emphasizes boundaries.
13. Hausdorff Distance: boundary-accuracy critical tasks.
14. Boundary Loss: strong boundary emphasis.
(Reference: losses.py:407-480.)
"""
