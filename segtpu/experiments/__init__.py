from segtpu.experiments.loss_comparison import main as run_loss_function
from segtpu.experiments.augmentation_amount import main as run_augmentation_amount
from segtpu.experiments.model_configuration import main as run_model_configuration
from segtpu.experiments.forward_selection import (
    run_augmentation_selection_experiment,
    AugmentationSelector,
)
