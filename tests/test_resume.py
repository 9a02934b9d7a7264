"""Checkpoint/resume of the full training state (params + BN stats +
optimizer state) — the resumable-training capability the reference lacks
(SURVEY.md §5 checkpoint row)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.data.loader import DeviceDataLoader
from segtpu.train.checkpoint import save_checkpoint, load_checkpoint
from segtpu.train.engine import get_engine, TrainState


def test_trainstate_checkpoint_resume(tmp_path, rng):
    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "combo"})
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 1e-5)
    imgs = jnp.asarray(rng.random((8, 32, 32, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((8, 32, 32, 1)) > 0.5).astype(np.float32))
    loader = DeviceDataLoader.from_arrays(imgs, masks, 4, shuffle=False)

    # train 2 epochs, checkpoint
    for i in range(2):
        state, _ = engine.run_train_epoch(state, loader, 1e-3,
                                          jax.random.key(i))
    save_checkpoint(str(tmp_path), jax.device_get(state), name="mid")

    # continue 1 epoch (ground truth)
    cont, m_ref = engine.run_train_epoch(state, loader, 1e-3,
                                         jax.random.key(9))

    # restore and continue identically
    restored_raw = load_checkpoint(str(tmp_path), name="mid",
                                   target=jax.device_get(state))
    restored = jax.tree.map(jnp.asarray, restored_raw)
    resumed, m_res = engine.run_train_epoch(restored, loader, 1e-3,
                                            jax.random.key(9))

    assert abs(m_ref["loss"] - m_res["loss"]) < 1e-5
    for a, b in zip(jax.tree.leaves(cont.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
