"""Gradient accumulation (TrainEngine.train_step_accum).

For effective batches larger than HBM allows in one forward: A micro-batch
gradients averaged into a single optimizer update. With identical
micro-batches the accumulated step must equal the plain step up to f32
rounding (train-mode BN normalizes by the current batch, so the forward
does not depend on the running-stats carry)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.train.engine import get_engine


@pytest.fixture(scope="module")
def engine_state():
    eng = get_engine({"backbone": "resnet34", "use_attention": False,
                      "loss_fn": "combo"})
    state = eng.init_state(jax.random.key(0), (1, 32, 32, 1),
                           learning_rate=1e-3, weight_decay=0.0)
    return eng, state


def _batch(key, b):
    imgs = jax.random.uniform(key, (b, 32, 32, 1))
    masks = (imgs > 0.5).astype(jnp.float32)
    return imgs, masks


def test_accum_identical_micro_batches_equals_plain_step(engine_state):
    eng, state = engine_state
    imgs, masks = _batch(jax.random.key(1), 2)
    plain, m_plain = eng._train_step(state, imgs, masks)
    stacked_i = jnp.stack([imgs] * 3)
    stacked_m = jnp.stack([masks] * 3)
    accum, m_accum = eng.train_step_accum(state, stacked_i, stacked_m)
    # (g+g+g)/3 differs from g by ≤1 ulp in f32, and Adam's first step is
    # sign-like (update ≈ ±lr·g/(|g|+eps)): a ulp that flips the sign of a
    # near-zero grad moves that param by up to 2·lr. So: bulk of params
    # bit-tight, isolated zero-crossing flips bounded by 2·lr, and only a
    # vanishing fraction of them.
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(plain.params),
                        jax.tree.leaves(accum.params))])
    assert np.quantile(diffs, 0.99) < 1e-6, np.quantile(diffs, 0.99)
    assert diffs.max() < 2.5e-3, diffs.max()  # 2·lr sign-flip bound
    assert (diffs > 1e-4).mean() < 1e-3
    assert abs(float(m_plain["loss"]) - float(m_accum["loss"])) < 1e-6


def test_accum_different_micro_batches_learns(engine_state):
    """Distinct micro-batches: one update per accumulation group, running
    BN stats advance, loss finite, params move."""
    eng, state = engine_state
    i1, m1 = _batch(jax.random.key(2), 2)
    i2, m2 = _batch(jax.random.key(3), 2)
    stacked_i = jnp.stack([i1, i2])
    stacked_m = jnp.stack([m1, m2])
    new_state, metrics = eng.train_step_accum(state, stacked_i, stacked_m)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)))
    assert moved
    # running stats advanced (two sequential momentum updates)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.batch_stats),
                        jax.tree.leaves(new_state.batch_stats)))
    assert changed


def test_accum_metrics_are_micro_batch_means(engine_state):
    eng, state = engine_state
    i1, m1 = _batch(jax.random.key(4), 2)
    i2, m2 = _batch(jax.random.key(5), 2)
    _, m_a = eng._train_step(state, i1, m1)
    _, m_b = eng._train_step(state, i2, m2)
    _, m_acc = eng.train_step_accum(state, jnp.stack([i1, i2]),
                                    jnp.stack([m1, m2]))
    want = (float(m_a["loss"]) + float(m_b["loss"])) / 2
    assert abs(float(m_acc["loss"]) - want) < 1e-6


def test_remat_step_matches_plain():
    """remat='full' (jax.checkpoint around the loss) performs the same
    math, but XLA may schedule the recomputed forward with different
    fusion/FMA contraction, so parity is fp-tight rather than bitwise
    (observed: bit-identical without --xla_cpu_max_isa, ulp-level diffs
    with it). Same Adam sign-flip caveat as the accumulation test."""
    from segtpu.train.engine import get_engine
    cfg = {"backbone": "resnet34", "use_attention": False,
           "loss_fn": "combo"}
    eng_p = get_engine(cfg)
    eng_r = get_engine({**cfg, "remat": "full"})
    assert eng_r.remat == "full" and eng_p.remat == "none"
    state = eng_p.init_state(jax.random.key(0), (1, 32, 32, 1),
                             learning_rate=1e-3, weight_decay=0.0)
    imgs, masks = _batch(jax.random.key(4), 2)
    sp, mp = eng_p._train_step(state, imgs, masks)
    sr, mr = eng_r._train_step(state, imgs, masks)
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(sp.params),
                        jax.tree.leaves(sr.params))])
    assert np.quantile(diffs, 0.99) < 1e-6, np.quantile(diffs, 0.99)
    assert diffs.max() < 2.5e-3, diffs.max()  # 2·lr sign-flip bound
    assert (diffs > 1e-4).mean() < 1e-3
    np.testing.assert_allclose(float(mp["loss"]), float(mr["loss"]),
                               rtol=1e-6)
