from segtpu.parallel.data_parallel import (
    DataParallel,
    shard_batch,
    replicate_state,
)
from segtpu.core.dist import create_mesh
