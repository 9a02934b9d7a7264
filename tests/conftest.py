"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so pjit/GSPMD sharding tests run without a TPU slice
(SURVEY.md §4e — the standard JAX trick)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
