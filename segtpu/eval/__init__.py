from segtpu.eval.folds import kfold_split, group_kfold_split, train_test_split_indices
from segtpu.eval.cross_validation import (
    CrossValidator,
    ModelComparator,
    quick_cv,
    quick_model_comparison,
)
from segtpu.eval.fold_parallel import (
    cv_train_folds_parallel,
    train_folds_parallel,
)
