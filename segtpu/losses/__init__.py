from segtpu.losses.functional import (
    dice_loss,
    bce_loss,
    weighted_bce_loss,
    balanced_bce_loss,
    focal_loss,
    tversky_loss,
    focal_tversky_loss,
    sensitivity_specificity_loss,
    log_cosh_dice_loss,
    combo_loss,
    exponential_logarithmic_loss,
    distance_map_bce_loss,
    hausdorff_loss,
    boundary_loss,
    triple_combo_loss,
)
from segtpu.losses.registry import get_loss_function, LOSS_FUNCTION_GUIDE, available_losses
