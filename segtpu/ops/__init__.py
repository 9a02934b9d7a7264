from segtpu.ops.resize import resize_area, resize_nearest, resize_bilinear
from segtpu.ops.clahe import clahe
from segtpu.ops.edt import distance_transform_edt
