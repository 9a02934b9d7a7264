from segtpu.viz.plots import (
    visualize_predictions,
    plot_broadband_vs_fluorescence,
    plot_class_imbalance,
)
