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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles of the U-Net graphs are
# expensive on this box's single CPU core; cache them across test runs.
# NOTE: per-HOST cache dir — XLA:CPU AOT executables are specialized to
# the compiling host's ISA features, containers hop hosts between rounds,
# and loading a foreign-host entry segfaults (observed mid-suite SIGSEGV
# in compilation_cache.get_executable_and_time). segtpu.__init__ applies
# the same fingerprinting when jax_platforms == "cpu".
from segtpu import _host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    "/root/.cache/segtpu_jax_cache_cpu_" + _host_fingerprint())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False,
                     help="run slow full-compile tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="slow: pass --run-slow to enable")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
