"""Training engine tests: optimizer parity vs torch, scheduler/early-stop
behavior, and the minimum end-to-end slice — quick_train on the synthetic
fixture must learn and return the reference result schema (SURVEY.md §7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.train.optim import torch_adam, ReduceLROnPlateau, EarlyStopping
from segtpu.train.engine import get_engine
from segtpu.data.loader import DeviceDataLoader


def test_torch_adam_matches_torch():
    torch = pytest.importorskip("torch")
    import optax
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)

    # torch: Adam with coupled weight decay
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=1e-2)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(5)]
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    tx = torch_adam(learning_rate=1e-2, weight_decay=1e-2)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(),
                               atol=1e-5)


def test_reduce_lr_on_plateau_matches_torch():
    torch = pytest.importorskip("torch")
    metrics = [0.5, 0.6, 0.61, 0.61, 0.61, 0.61, 0.61, 0.62, 0.62, 0.62,
               0.62, 0.62, 0.62]

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=3, threshold=0.01, min_lr=1e-6)
    ours = ReduceLROnPlateau(1e-3, mode="max", factor=0.5, patience=3,
                             threshold=0.01, min_lr=1e-6)
    for m in metrics:
        sch.step(m)
        lr_t = opt.param_groups[0]["lr"]
        lr_o = ours.step(m)
        assert abs(lr_t - lr_o) < 1e-12, (m, lr_t, lr_o)


def test_early_stopping_contract():
    es = EarlyStopping(patience=2, min_delta=0.001)
    assert not es.step(0.5)
    assert not es.step(0.6)     # improvement
    assert not es.step(0.6)     # no improvement (1)
    assert es.step(0.6)         # no improvement (2) → stop
    assert es.early_stop


@pytest.fixture(scope="module")
def tiny_problem():
    """A learnable synthetic problem: bright blob on dark background."""
    rng = np.random.default_rng(1)
    n, s = 16, 32
    imgs = rng.normal(0.3, 0.05, (n, s, s, 1)).astype(np.float32)
    masks = np.zeros((n, s, s, 1), np.float32)
    for i in range(n):
        cy, cx = rng.integers(8, 24, 2)
        yy, xx = np.mgrid[0:s, 0:s]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 36
        imgs[i, blob, 0] += 0.5
        masks[i, blob, 0] = 1.0
    return jnp.asarray(imgs), jnp.asarray(masks)


def test_engine_learns_tiny_problem(tiny_problem):
    imgs, masks = tiny_problem
    config = {"backbone": "resnet34", "use_attention": False,
              "loss_fn": "combo"}
    engine = get_engine(config)
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1),
                              learning_rate=1e-3, weight_decay=1e-5)
    loader = DeviceDataLoader.from_arrays(imgs, masks, batch_size=4,
                                          shuffle=True, seed=0)
    state, m0 = engine.run_train_epoch(state, loader, 1e-3,
                                       jax.random.key(1))
    for i in range(14):
        state, m = engine.run_train_epoch(state, loader, 1e-3,
                                          jax.random.key(2 + i))
    assert m["loss"] < m0["loss"]
    assert m["iou"] > 0.5, m  # learnable blob problem


def test_bf16_training_learns(tiny_problem):
    """Mixed-precision path: bf16 compute / f32 params+optimizer."""
    imgs, masks = tiny_problem
    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "combo", "dtype": "bfloat16"})
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 1e-5)
    # params stay f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))
    loader = DeviceDataLoader.from_arrays(imgs[:8], masks[:8], batch_size=4,
                                          shuffle=False)
    state, m0 = engine.run_train_epoch(state, loader, 1e-3, jax.random.key(1))
    for i in range(4):
        state, m = engine.run_train_epoch(state, loader, 1e-3,
                                          jax.random.key(2 + i))
    assert m["loss"] < m0["loss"]


def test_eval_deterministic(tiny_problem):
    imgs, masks = tiny_problem
    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "bce"})
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 0.0)
    loader = DeviceDataLoader.from_arrays(imgs, masks, batch_size=4,
                                          shuffle=False)
    m1 = engine.run_eval_epoch(state, loader)
    m2 = engine.run_eval_epoch(state, loader)
    for k in m1:
        assert m1[k] == m2[k]


def test_metrics_weighting_matches_per_batch_average(tiny_problem):
    """Epoch metrics must equal the sample-weighted mean of per-batch
    metrics (train.py:56-67), including a remainder batch."""
    imgs, masks = tiny_problem
    imgs, masks = imgs[:10], masks[:10]  # 10 samples, bs 4 → 4,4,2
    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "bce"})
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 0.0)
    loader = DeviceDataLoader.from_arrays(imgs, masks, batch_size=4,
                                          shuffle=False)
    got = engine.run_eval_epoch(state, loader)

    # manual per-batch computation
    from segtpu.metrics import calculate_metrics
    from segtpu.losses import bce_loss

    def fwd(x):
        return engine.model.apply({"params": state.params,
                                   "batch_stats": state.batch_stats}, x,
                                  train=False)

    totals = {k: 0.0 for k in got}
    n = 0
    for lo in (slice(0, 4), slice(4, 8), slice(8, 10)):
        logits = fwd(imgs[lo])
        bm = {k: float(v) for k, v in
              calculate_metrics(jax.nn.sigmoid(logits), masks[lo]).items()}
        bm["loss"] = float(bce_loss(logits, masks[lo]))
        bsz = logits.shape[0]
        for k in totals:
            totals[k] += bm[k] * bsz
        n += bsz
    for k in totals:
        assert abs(got[k] - totals[k] / n) < 1e-4, k
