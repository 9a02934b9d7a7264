"""Orbax checkpoint round-trip (SURVEY.md §5 checkpoint/resume row)."""

import numpy as np

import jax
import jax.numpy as jnp

from segtpu.train.checkpoint import save_checkpoint, load_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"conv": {"kernel": jnp.arange(12.0).reshape(3, 4),
                            "bias": jnp.zeros(4)}},
        "step": jnp.asarray(7),
    }
    save_checkpoint(str(tmp_path), state, name="ckpt")
    restored = load_checkpoint(str(tmp_path), name="ckpt")
    np.testing.assert_array_equal(np.asarray(restored["params"]["conv"]["kernel"]),
                                  np.asarray(state["params"]["conv"]["kernel"]))
    assert int(np.asarray(restored["step"])) == 7


def test_checkpoint_with_target_structure(tmp_path):
    state = {"w": jnp.ones((2, 2), jnp.float32)}
    save_checkpoint(str(tmp_path), state, name="c2")
    restored = load_checkpoint(str(tmp_path), name="c2", target=state)
    assert restored["w"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones((2, 2)))
