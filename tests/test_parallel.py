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

    # halo mode under the mesh, BOTH assembly paths: batch_tiles=8 →
    # 2 batches (scatter scan), batch_tiles=16 ≥ 9 tiles → one forward
    # (transpose/reshape fast path) — each must match unsharded
    for bt in (8, 16):
        base_h = make_tiled_predictor(apply_fn, tile=32, overlap=8,
                                      batch_tiles=bt, mode="halo")
        sharded_h = make_tiled_predictor(apply_fn, tile=32, overlap=8,
                                         batch_tiles=bt, mode="halo",
                                         shard_tiles_axis="data")
        ref_h = np.asarray(base_h(img))
        with mesh:
            got_h = np.asarray(sharded_h(img))
        np.testing.assert_allclose(got_h, ref_h, atol=1e-5)


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    """Real 2-process jax.distributed run (VERDICT r2 #6): two workers with
    4 virtual CPU devices each form a global 8-device mesh, each process
    contributes its half of the global batch via global_batch_from_local,
    and two sharded train steps run with gloo cross-process collectives.
    The replicated loss must match the same steps run single-process on
    8 local virtual devices."""
    import os
    import re
    import socket
    import subprocess
    import sys

    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    worker = os.path.join(os.path.dirname(__file__), "two_process_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flags
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    m = re.search(r"RESULT loss=([\d.]+) loss2=([\d.]+)", outs[0])
    assert m, outs[0][-3000:]
    loss_mp, loss2_mp = float(m.group(1)), float(m.group(2))

    # single-process reference: same data, same engine, 8 local devices
    rng = np.random.default_rng(0)
    S, N = 32, 8
    imgs = rng.uniform(0, 1, (N, S, S, 1)).astype(np.float32)
    masks = (imgs > 0.5).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data", None, None, None))
    engine = get_engine({"backbone": "resnet_tiny", "use_attention": False,
                         "loss_fn": "combo"})
    state = jax.device_get(
        engine.init_state(jax.random.key(0), (1, S, S, 1), 1e-3, 1e-5))
    gi, gm = jax.device_put(imgs, sh), jax.device_put(masks, sh)
    with mesh:
        st1, m1 = engine._train_step(state, gi, gm)
        st2, m2 = engine._train_step(st1, gi, gm)
    assert abs(float(m1["loss"]) - loss_mp) < 1e-4, \
        (float(m1["loss"]), loss_mp)
    assert abs(float(m2["loss"]) - loss2_mp) < 1e-4, \
        (float(m2["loss"]), loss2_mp)


@pytest.mark.parametrize("backbone", ["resnet50", "densenet121"])
def test_all_backbones_shard_lower(backbone):
    """VERDICT r4 #6: the heavy backbones (densenet121's concat-heavy
    encoder is the GSPMD-surprise candidate) must LOWER under the
    8-device mesh with DP shardings — trace-only, no XLA compile, so this
    stays cheap on the 1-core host. resnet34 is covered by the full
    numeric tests above."""
    engine = get_engine({"backbone": backbone, "use_attention": True,
                         "loss_fn": "combo"})
    # eval_shape-style init: structure without compiling the init program
    shapes = jax.eval_shape(
        lambda k: engine.model.init(k, jnp.zeros((1, 64, 64, 1)),
                                    train=False),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          shapes["params"])
    stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                         shapes.get("batch_stats", {}))
    state = engine.state_from(params, stats, 1e-3, 1e-5)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    sh = NamedSharding(mesh, P("data", None, None, None))
    imgs = jax.device_put(jnp.zeros((8, 64, 64, 1), jnp.float32), sh)
    masks = jax.device_put(jnp.zeros((8, 64, 64, 1), jnp.float32), sh)

    lowered = jax.jit(engine._train_step_impl).lower(state, imgs, masks)
    txt = lowered.as_text()
    # the module really is mesh-partitioned: 8 partitions and the batch
    # axis annotated (Shardy `sdy.sharding<@mesh, [{"data"}...]>` on new
    # JAX, GSPMD `devices=[8,...]` mhlo.sharding strings on older)
    assert "num_partitions = 8" in txt
    assert '{"data"}' in txt or "devices=[8" in txt
