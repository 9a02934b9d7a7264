from segtpu.parallel.data_parallel import (
    DataParallel,
    shard_batch,
    replicate_state,
)
from segtpu.parallel.multihost import global_batch_from_local, process_local_slice
from segtpu.core.dist import create_mesh
