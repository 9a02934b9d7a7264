"""Optimizer registry: torch-differential parity (AdamW, SGD) and
engine integration for the ``optimizer`` config key.

New capability beyond the reference (its entry points hard-code
torch.optim.Adam, train.py:331-335): adamw / sgd / lamb selectable per
config, all as inject_hyperparams chains so the plateau controller and
LR plumbing work unchanged (segtpu/train/optim.py::make_optimizer).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from segtpu.data.loader import DeviceDataLoader
from segtpu.train.engine import get_engine, _optimizer_spec
from segtpu.train.optim import make_optimizer, set_learning_rate


def _run_optax(tx, w0, grads):
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params), state


def _grads(rng, n=5, shape=(5, 3)):
    return [rng.normal(size=shape).astype(np.float32) for _ in range(n)]


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = _grads(rng)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([wt], lr=1e-2, weight_decay=1e-2)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    ours, _ = _run_optax(make_optimizer("adamw", 1e-2, 1e-2), w0, grads)
    np.testing.assert_allclose(ours, wt.detach().numpy(), atol=1e-5)


@pytest.mark.parametrize("nesterov", [False, True])
def test_sgd_matches_torch(nesterov):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = _grads(rng)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=1e-2, momentum=0.9, nesterov=nesterov,
                          weight_decay=1e-2)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    ours, _ = _run_optax(
        make_optimizer("sgd", 1e-2, 1e-2, momentum=0.9, nesterov=nesterov),
        w0, grads)
    np.testing.assert_allclose(ours, wt.detach().numpy(), atol=1e-5)


def test_lamb_matches_optax():
    rng = np.random.default_rng(2)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = _grads(rng)
    ours, _ = _run_optax(make_optimizer("lamb", 1e-2, 1e-2), w0, grads)
    ref, _ = _run_optax(optax.lamb(1e-2, weight_decay=1e-2), w0, grads)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError, match="Unknown optimizer"):
        make_optimizer("rmsprop")


def test_lr_injection_works_for_all():
    """set_learning_rate must work on every chain (no recompile plumbing)."""
    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(4, 2)).astype(np.float32)
    for name in ("adam", "adamw", "sgd", "lamb"):
        tx = make_optimizer(name, 1e-2, 0.0)
        params = jnp.asarray(w0)
        state = tx.init(params)
        state = set_learning_rate(state, 1e-3)
        assert float(state.hyperparams["learning_rate"]) == pytest.approx(1e-3)
        updates, state = tx.update(jnp.asarray(w0), state, params)
        jax.tree.map(lambda u: u.block_until_ready(), updates)


def test_optimizer_spec_cache_key():
    name, kw = _optimizer_spec({"optimizer": "SGD", "momentum": 0.8,
                                "nesterov": True})
    assert name == "sgd" and dict(kw) == {"momentum": 0.8, "nesterov": True}
    # non-sgd drops sgd-only keys; adam_eps maps to eps
    name, kw = _optimizer_spec({"optimizer": "adamw", "momentum": 0.8,
                                "adam_eps": 1e-6})
    assert name == "adamw" and dict(kw) == {"eps": 1e-6}
    assert _optimizer_spec({}) == ("adam", ())


def test_engine_sgd_trains(tiny_problem_local):
    """End-to-end: the engine with optimizer='sgd' learns and the injected
    LR path (plateau-controller contract) is intact."""
    imgs, masks = tiny_problem_local
    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "combo", "optimizer": "sgd",
                         "momentum": 0.9})
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 5e-3, 0.0)
    loader = DeviceDataLoader.from_arrays(imgs[:8], masks[:8], batch_size=4,
                                          shuffle=False)
    state, m0 = engine.run_train_epoch(state, loader, 5e-3, jax.random.key(1))
    for i in range(4):
        state, m = engine.run_train_epoch(state, loader, 5e-3,
                                          jax.random.key(2 + i))
    assert m["loss"] < m0["loss"]


@pytest.fixture()
def tiny_problem_local():
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
