"""GSPMD data-parallel tests on the 8-virtual-device CPU mesh
(SURVEY.md §4e)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segtpu.core.dist import create_mesh
from segtpu.parallel import DataParallel, shard_batch, replicate_state
from segtpu.train.engine import get_engine


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert jax.default_backend() == "cpu"


def test_mesh_and_shard_placement():
    mesh = create_mesh(axis_names=("data",))
    x = jnp.zeros((16, 8, 8, 1))
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data", None, None, None)
    # each device holds 16/8 = 2 samples
    shard_shape = xs.sharding.shard_shape(x.shape)
    assert shard_shape[0] == 2


@pytest.fixture(scope="module")
def engine_and_batch():
    config = {"backbone": "resnet34", "use_attention": False,
              "loss_fn": "combo"}
    engine = get_engine(config)
    state = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 1e-5)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((8, 32, 32, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((8, 32, 32, 1)) > 0.5)
                        .astype(np.float32))
    return engine, state, imgs, masks


def test_dp_step_matches_single_device(engine_and_batch):
    """The DP-sharded train step must produce the same math as the
    single-device step (same global batch; BN batch-mean becomes a global
    reduction under GSPMD == single-device semantics, SURVEY.md §7 #9)."""
    engine, state, imgs, masks = engine_and_batch

    # single device
    s1, m1 = engine._train_step(state, imgs, masks)

    # data parallel over 8 devices
    dp = DataParallel()
    state_r = dp.replicate(state)
    with dp.mesh:
        s8, m8 = engine._train_step(state_r, dp.shard(imgs), dp.shard(masks))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    for k in ("iou", "f1"):
        assert abs(float(m1[k]) - float(m8[k])) < 1e-4
    # parameters after the step agree. Tolerance note: Adam divides by
    # sqrt(v)+eps, so for near-zero gradients the cross-device reduction
    # order can flip the update sign — differences up to ~2·lr are
    # numerical, not semantic.
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(p1, p8))
    assert worst < 2e-3, worst


def test_dp_epoch_runs(engine_and_batch):
    engine, state, imgs, masks = engine_and_batch
    from segtpu.data.loader import DeviceDataLoader
    dp = DataParallel()
    loader = DeviceDataLoader.from_arrays(
        jnp.tile(imgs, (2, 1, 1, 1)), jnp.tile(masks, (2, 1, 1, 1)),
        batch_size=8, shuffle=False)
    dp.shard_loader(loader)
    state_r = dp.replicate(state)
    with dp.mesh:
        state2, metrics = engine.run_train_epoch(state_r, loader, 1e-3)
    assert np.isfinite(metrics["loss"])


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_multihost_input_sharding_single_process():
    """global_batch_from_local on one process == sharded device_put; the
    training step consumes it identically (multi-host pods use the same
    call with per-process slices)."""
    from segtpu.parallel import global_batch_from_local, process_local_slice
    mesh = create_mesh(axis_names=("data",))
    rng = np.random.default_rng(0)
    local = rng.random((16, 8, 8, 1)).astype(np.float32)
    arr = global_batch_from_local(local, mesh)
    assert arr.shape == (16, 8, 8, 1)
    assert arr.sharding.spec == P("data", None, None, None)
    np.testing.assert_allclose(np.asarray(arr), local)
    sl = process_local_slice(100)
    assert sl == slice(0, 100)  # single process owns everything


def test_tiled_inference_sharded_over_mesh():
    """Tile batches sharded across the 8-device mesh must produce the same
    logits as unsharded tiled inference."""
    from segtpu.core.dist import create_mesh
    from segtpu.infer.tiled import make_tiled_predictor

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(96, 96, 1)).astype(np.float32))

    def apply_fn(x):  # cheap stand-in model
        return jnp.tanh(x * 1.5 + 0.1)

    base = make_tiled_predictor(apply_fn, tile=32, overlap=8, batch_tiles=8)
    ref = np.asarray(base(img))

    mesh = create_mesh(axis_names=("data",))
    sharded = make_tiled_predictor(apply_fn, tile=32, overlap=8,
                                   batch_tiles=8, shard_tiles_axis="data")
    with mesh:
        got = np.asarray(sharded(img))
    np.testing.assert_allclose(got, ref, atol=1e-5)
