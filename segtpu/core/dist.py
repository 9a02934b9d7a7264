"""Device / mesh plumbing.

Replaces the reference's MPS→CUDA→CPU fallback (utils.py:153-167) with
TPU→CPU selection plus `jax.sharding.Mesh` construction for GSPMD data
parallelism (no reference equivalent; see SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_device(verbose: bool = True):
    """Best available device: TPU (or other accelerator) → CPU.

    Reference parity: utils.py:153-167 (prints the chosen device kind)."""
    dev = jax.devices()[0]
    if verbose:
        print(f"Using {dev.platform.upper()} device")
    return dev


def device_kind() -> str:
    return jax.devices()[0].platform


def create_mesh(axis_sizes: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("data",),
                devices=None) -> Mesh:
    """Build a device mesh for pjit/GSPMD.

    Defaults to a 1-D ``('data',)`` mesh over all devices — the parallelism
    strategy that matters for this CNN workload (DP over batch; SURVEY.md §2.4).
    Multi-axis meshes (e.g. ``('data', 'spatial')``) supported for spatial
    partitioning of large-image inference.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices[: int(np.prod(axis_sizes))]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data", ndim: int = 4) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across ``axis``."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
