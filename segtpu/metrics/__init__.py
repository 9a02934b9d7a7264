from segtpu.metrics.metrics import (
    calculate_metrics,
    iou_score,
    post_process,
    compute_foreground_ratio,
)
from segtpu.metrics.threshold import sweep_thresholds
