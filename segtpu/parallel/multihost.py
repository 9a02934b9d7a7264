"""Multi-host input sharding.

For multi-host TPU pods each process holds only its slice of the global
batch; `jax.make_array_from_process_local_data` assembles the logical
global array without gathering (SURVEY.md §2.4: "cross-host input sharding
via jax.make_array_from_process_local_data"). On a single host this
degenerates to a plain device_put with the same sharding, so the training
code is identical either way.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_from_local(local_batch: np.ndarray, mesh: Mesh,
                            axis: str = "data"):
    """Assemble a globally-sharded batch from this process's local shard.

    ``local_batch``: the samples THIS process contributes, shape
    (local_B, ...). The global batch has local_B × n_processes rows,
    sharded over ``axis``. Single-process: local == global.
    """
    sharding = NamedSharding(mesh, P(axis, *([None] * (local_batch.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def process_local_slice(n_global: int) -> slice:
    """Which rows of a global dataset this process should load
    (contiguous block partitioning)."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_global // n)
    return slice(p * per, min((p + 1) * per, n_global))
