from segtpu.parallel.data_parallel import (
    DataParallel,
    shard_batch,
    replicate_state,
)
from segtpu.parallel.multihost import global_batch_from_local, process_local_slice
from segtpu.parallel.spatial import (
    make_spatial_sharded_predictor,
    spatial_predict,
)
from segtpu.core.dist import create_mesh
