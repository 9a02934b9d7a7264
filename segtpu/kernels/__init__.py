from segtpu.kernels.fused_conv import (
    conv3x3_bn_relu_pallas,
    conv3x3_bn_relu_xla,
    upsample2x_concat_pallas,
    upsample2x_concat_xla,
)
