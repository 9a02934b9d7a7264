"""Engine caching and scheduler edge cases."""

import numpy as np
import pytest

from segtpu.core.caching import LRUCache
from segtpu.train.engine import (_ENGINE_CACHE, auto_pipeline_window,
                                 get_engine, _loss_cache_key, tree_bytes)
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


def test_lru_cache_eviction_and_recency():
    c = LRUCache(2)
    c["a"], c["b"] = 1, 2
    assert c["a"] == 1            # touch a → b is now oldest
    c["c"] = 3                    # evicts b
    assert "b" not in c and "a" in c and "c" in c
    assert len(c) == 2
    assert c.get("b", 42) == 42
    with pytest.raises(ValueError):
        LRUCache(0)


def test_engine_cache_eviction_does_not_break_reuse():
    """Evicting an engine from the bounded cache must only force a
    re-build on revisit — a later get_engine with the same config
    returns a WORKING engine (VERDICT r3 #8)."""
    cfg = {"backbone": "resnet34", "use_attention": False,
           "loss_fn": "bce"}
    a = get_engine(cfg)
    # flood the cache past its cap with distinct configs
    for i in range(_ENGINE_CACHE.cap + 2):
        get_engine({"backbone": "resnet34", "use_attention": False,
                    "loss_fn": "tversky", "tversky_alpha": 0.01 * (i + 1)})
    b = get_engine(cfg)           # rebuilt after eviction
    assert b is not a
    assert b.loss_fn is not None and callable(b.loss_fn)
    assert len(_ENGINE_CACHE) <= _ENGINE_CACHE.cap


def test_auto_pipeline_window_scales_with_hbm():
    # explicit setting always wins
    assert auto_pipeline_window({"pipeline_epochs": 2}, 10**12) == 2
    # tiny epochs → full default window of 4
    assert auto_pipeline_window({}, 1_000_000) == 4
    # 4 GB budget / 3 GB per epoch → window 1 (no silent OOM)
    assert auto_pipeline_window({}, 3 * 10**9) == 1
    # 4 GB budget / 1.5 GB per epoch → window 2
    assert auto_pipeline_window({}, int(1.5 * 10**9)) == 2
    # custom budget key respected
    assert auto_pipeline_window({"pipeline_hbm_budget": 8e9},
                                int(1.5 * 10**9)) == 4
    # never below 1 even when one epoch exceeds the budget
    assert auto_pipeline_window({}, 10**12) == 1


def test_tree_bytes_counts_shape_structs():
    import jax
    structs = {"w": jax.ShapeDtypeStruct((4, 4), np.float32),
               "b": jax.ShapeDtypeStruct((4,), np.dtype("bfloat16"))}
    assert tree_bytes(structs) == 4 * 4 * 4 + 4 * 2
    assert tree_bytes(structs, structs) == 2 * tree_bytes(structs)


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
