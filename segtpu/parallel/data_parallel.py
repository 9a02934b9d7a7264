"""GSPMD data parallelism over a device mesh.

The reference is strictly single-device (SURVEY.md §2.4 — no
torch.distributed anywhere); this module is the new-framework capability:
DP over the batch axis via ``jax.sharding`` + jit/GSPMD, with XLA emitting
the gradient all-reduce over ICI. No NCCL-style code: sharding annotations
on the inputs are the entire programming model.

- batches sharded ``P('data', None, None, None)``
- params / opt state replicated ``P()``
- BatchNorm's batch-mean under GSPMD becomes a global (cross-replica)
  reduction automatically == sync-BN == single-device semantics at the same
  global batch (SURVEY.md §7 hard part 9).

Works with the existing TrainEngine: its jitted step/epoch programs are
sharding-polymorphic — feed sharded arrays and replicated state, and GSPMD
partitions the whole program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(arr, mesh: Mesh, axis: str = "data"):
    """Place a (B, ...) array with the batch axis sharded over ``axis``."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate_state(state: Any, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        state)


class DataParallel:
    """Convenience wrapper: holds a mesh and places loader output / state.

    Usage::

        dp = DataParallel()                     # all devices, 1-D mesh
        state = dp.replicate(state)
        imgs = dp.shard(imgs); masks = dp.shard(masks)
        state, metrics = engine.run_train_epoch(state, loader, lr)  # GSPMD
    """

    def __init__(self, mesh: Optional[Mesh] = None, axis: str = "data"):
        from segtpu.core.dist import create_mesh
        self.mesh = mesh if mesh is not None else create_mesh(
            axis_names=(axis,))
        self.axis = axis

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def shard(self, arr):
        return shard_batch(arr, self.mesh, self.axis)

    def replicate(self, state):
        return replicate_state(state, self.mesh)

    def shard_loader(self, loader):
        """Re-place a DeviceDataLoader's arrays batch-sharded."""
        loader.images = self.shard(loader.images)
        loader.masks = self.shard(loader.masks)
        return loader
