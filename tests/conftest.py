"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so pjit/GSPMD sharding tests run without a TPU slice
(SURVEY.md §4e — the standard JAX trick)."""

import os

# Force override: the environment presets the axon TPU tunnel (its
# sitecustomize register() wins over JAX_PLATFORMS env); tests must run on
# the local 8-virtual-device CPU platform. jax.config.update is the only
# override that sticks.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Some hosts this container lands on differ from the machine model
# jaxlib's CPU client compiles for (cpu_aot_loader logs "machine feature
# +prefer-no-scatter not supported ... could lead to SIGILL"), and long
# runs intermittently SEGFAULT inside native XLA:CPU compile/load. Cap
# codegen at AVX2 so emitted code never exceeds the weakest host.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache on CPU: deserializing XLA:CPU AOT
# cache entries intermittently SEGFAULTS on this stack (observed twice at
# compilation_cache.get_executable_and_time, even with a fresh same-host
# cache dir; cpu_aot_loader logs "+prefer-no-scatter not supported"
# machine-feature mismatches first). segtpu.__init__ likewise skips the
# cache when jax_platforms == "cpu"; the in-process jit cache still
# amortizes compiles within a run.

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False,
                     help="run slow full-compile tests")


# `-m fast` regression subset (VERDICT r3 #5): modules whose tests avoid
# big-model compiles — together they run in well under 10 minutes on this
# 1-core host and cover the registry/loss/metric/op/data/controller logic
# where regressions actually land. Heavier end-to-end/GSPMD/experiment
# modules stay full-suite-only.
FAST_MODULES = {
    "test_losses", "test_metrics", "test_ops", "test_models",
    "test_data", "test_misc", "test_engine_cache", "test_augment_stats",
    "test_convert", "test_checkpoint", "test_viz", "test_tboard",
    "test_threshold",
}


def pytest_collection_modifyitems(config, items):
    fast_marker = pytest.mark.fast
    for item in items:
        mod = os.path.splitext(os.path.basename(str(item.fspath)))[0]
        if mod in FAST_MODULES and "slow" not in item.keywords:
            item.add_marker(fast_marker)
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="slow: pass --run-slow to enable")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
