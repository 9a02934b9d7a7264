"""Shared experiment utilities: JSON-safe result persistence.

The reference persists results as ``torch.save`` pickles + JSON summaries
(SURVEY.md §5 checkpoint row). We persist everything as JSON (robust,
inspectable, resumable) with numpy/jax scalars coerced."""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Any

import numpy as np


def to_jsonable(obj: Any):
    if isinstance(obj, dict):
        return {str(k): to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def save_results(save_dir: str, name: str, results: Any) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, name)
    with open(path, "w") as f:
        json.dump(to_jsonable(results), f, indent=2)
    print(f"Results saved to {path}")
    return path


def timestamp() -> str:
    return datetime.now().strftime("%Y%m%d_%H%M%S")
