"""Edge cases: loader, config helpers, resize upscale switch, logger."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.core.config import expand_grid, merge_config, cfg_get
from segtpu.core.logging import MetricsLogger
from segtpu.core.profiling import StepTimer
from segtpu.data.loader import DeviceDataLoader
from segtpu.ops.resize import resize_area


def test_loader_batch_larger_than_dataset(rng):
    imgs = jnp.asarray(rng.random((3, 8, 8, 1)).astype(np.float32))
    masks = jnp.zeros((3, 8, 8, 1))
    loader = DeviceDataLoader.from_arrays(imgs, masks, batch_size=8,
                                          shuffle=False)
    (fi, fm), rem = loader.batches()
    assert fi.shape[0] == 0
    assert rem[0].shape == (3, 8, 8, 1)
    assert len(loader) == 1
    assert sum(b[0].shape[0] for b in loader) == 3


def test_loader_exact_multiple(rng):
    imgs = jnp.asarray(rng.random((8, 4, 4, 1)).astype(np.float32))
    loader = DeviceDataLoader.from_arrays(imgs, imgs, batch_size=4,
                                          shuffle=False)
    (fi, _), rem = loader.batches()
    assert fi.shape[0] == 2 and rem is None


def test_shuffle_covers_all_samples(rng):
    imgs = jnp.asarray(np.arange(10, dtype=np.float32)
                       .reshape(10, 1, 1, 1))
    loader = DeviceDataLoader.from_arrays(imgs, imgs, batch_size=3,
                                          shuffle=True, seed=1)
    seen = []
    for b, _ in loader:
        seen.extend(b.reshape(-1).tolist())
    assert sorted(seen) == list(range(10))


def test_expand_grid_names():
    configs = expand_grid({"x": 1}, {"backbone": ["a", "b"],
                                     "use_attention": [True],
                                     "batch_size": [2]})
    assert len(configs) == 2
    assert configs[0]["name"] == "backbone_a_att_True_bs_2"
    assert configs[0]["config_params"] == {"backbone": "a",
                                           "use_attention": True,
                                           "batch_size": 2}
    assert configs[0]["x"] == 1


def test_merge_and_get():
    base = {"a": 1}
    m = merge_config(base, b=2)
    assert m == {"a": 1, "b": 2} and base == {"a": 1}
    assert cfg_get(None, "k", 5) == 5
    assert cfg_get({"k": 7}, "k", 5) == 7


def test_resize_area_upscale_is_bilinear(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    ours = np.asarray(resize_area(jnp.asarray(img), (64, 64)))
    ref = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as log:
        log.log({"epoch": 0, "loss": 0.5}, kind="epoch")
        log.log({"epoch": 1, "loss": jnp.asarray(0.25)}, kind="epoch")
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[1]["loss"] == 0.25
    assert lines[0]["kind"] == "epoch"


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert "a" in t.report()


def test_bucket_shapes():
    from segtpu.train.engine import TrainEngine
    b = TrainEngine._bucket
    assert b(5) == 5
    assert b(26) == b(27) == 32   # CV folds share a compile
    assert b(100) % 16 == 0
    for n in (9, 26, 100, 1000):
        assert b(n) >= n
