"""Worker for the 2-process jax.distributed test (tests/test_parallel.py).

Each of the two processes owns 4 virtual CPU devices (global mesh: 8) and
contributes its local half of the global batch via
``segtpu.parallel.multihost.global_batch_from_local`` — the cross-host
input-sharding path SURVEY §2.4 names (no gather: each process places only
the rows it holds). One sharded train step runs; process 0 prints the
replicated loss for the parent test to compare against a single-process
run of the same step.

Usage: python two_process_worker.py <coordinator_port> <process_id>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT, PID = sys.argv[1], int(sys.argv[2])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=4").strip()
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Cross-process collectives on the CPU backend need gloo (the default
# 'none' cannot all-reduce across processes).
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from segtpu.parallel.multihost import (  # noqa: E402
    global_batch_from_local, process_local_slice)
from segtpu.train.engine import get_engine  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4, len(jax.local_devices())

S, N_GLOBAL = 32, 8
rng = np.random.default_rng(0)
imgs = rng.uniform(0, 1, (N_GLOBAL, S, S, 1)).astype(np.float32)
masks = (imgs > 0.5).astype(np.float32)

mesh = Mesh(np.asarray(jax.devices()), ("data",))
sl = process_local_slice(N_GLOBAL)
gi = global_batch_from_local(imgs[sl], mesh)
gm = global_batch_from_local(masks[sl], mesh)
assert gi.shape == (N_GLOBAL, S, S, 1), gi.shape

engine = get_engine({"backbone": "resnet_tiny", "use_attention": False,
                     "loss_fn": "combo"})
# host (uncommitted) state: deterministic same value on both processes,
# treated as fully replicated by the jitted step
state = jax.device_get(
    engine.init_state(jax.random.key(0), (1, S, S, 1), 1e-3, 1e-5))
with mesh:
    new_state, metrics = engine._train_step(state, gi, gm)
    loss = float(metrics["loss"])
    # one more step so the gradient all-reduce path runs repeatedly
    new_state2, metrics2 = engine._train_step(new_state, gi, gm)
    loss2 = float(metrics2["loss"])

if PID == 0:
    print(f"RESULT loss={loss:.10f} loss2={loss2:.10f}", flush=True)
print(f"worker {PID}: OK", flush=True)
