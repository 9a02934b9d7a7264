"""Engine caching and scheduler edge cases."""

import numpy as np
import pytest

from segtpu.train.engine import get_engine, _loss_cache_key
from segtpu.train.optim import ReduceLROnPlateau


def test_engine_cache_hit_same_config():
    a = get_engine({"backbone": "resnet34", "use_attention": False,
                    "loss_fn": "bce"})
    b = get_engine({"backbone": "resnet34", "use_attention": False,
                    "loss_fn": "bce"})
    assert a is b  # compiled programs shared across folds/sweeps


def test_engine_cache_miss_on_loss_hyperparams():
    a = get_engine({"backbone": "resnet34", "use_attention": False,
                    "loss_fn": "tversky", "tversky_alpha": 0.5})
    b = get_engine({"backbone": "resnet34", "use_attention": False,
                    "loss_fn": "tversky", "tversky_alpha": 0.3})
    assert a is not b


def test_engine_cache_miss_on_architecture():
    a = get_engine({"backbone": "resnet34", "use_attention": False,
                    "loss_fn": "bce"})
    b = get_engine({"backbone": "resnet34", "use_attention": True,
                    "loss_fn": "bce"})
    assert a is not b


def test_custom_criterion_bypasses_cache():
    fn = lambda logits, targets: abs(logits).mean()
    a = get_engine({"backbone": "resnet34", "use_attention": False}, fn)
    b = get_engine({"backbone": "resnet34", "use_attention": False}, fn)
    assert a is not b


def test_plateau_min_mode():
    sch = ReduceLROnPlateau(1.0, mode="min", factor=0.1, patience=1,
                            threshold=0.0, min_lr=1e-3)
    assert sch.step(1.0) == 1.0
    assert sch.step(0.5) == 1.0       # improvement
    assert sch.step(0.5) == 1.0       # bad 1
    assert sch.step(0.5) == 0.1       # bad 2 > patience → reduce
    for _ in range(10):
        lr = sch.step(0.5)
    assert lr >= 1e-3                 # min_lr floor
