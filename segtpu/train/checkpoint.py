"""Orbax checkpointing.

The reference keeps best weights in memory and has an unused
``torch.save`` helper (utils.py:192-195; SURVEY.md §5). Here checkpointing
is a first-class subsystem: params + batch stats + opt state snapshots via
Orbax, enabling resumable training/experiments.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, name: str = "checkpoint") -> str:
    """Save a pytree (e.g. TrainState or (params, batch_stats)) under
    ``path/name``. Returns the checkpoint directory."""
    import orbax.checkpoint as ocp
    target = os.path.abspath(os.path.join(path, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    print("Saving checkpoint:", target)
    return target


def load_checkpoint(path: str, name: str = "checkpoint",
                    target: Optional[Any] = None) -> Any:
    """Restore a pytree saved by ``save_checkpoint``. If ``target`` (an
    abstract/concrete pytree of the same structure) is given, restores with
    matching dtypes/shapes."""
    import orbax.checkpoint as ocp
    full = os.path.abspath(os.path.join(path, name))
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, target)
        return ckptr.restore(full, abstract)
    return ckptr.restore(full)
