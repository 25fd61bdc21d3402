"""Test configuration: force the CPU backend with 8 virtual devices and
float64 before JAX initialises.

Parity with the float64 NumPy oracle requires x64; multi-chip sharding
tests use the 8 virtual CPU devices (SURVEY.md §7 — real multi-chip
hardware is unavailable, the mesh layer must compile/execute on a virtual
mesh).  Benchmarks (bench.py) run in a separate process on the real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The hosted TPU plugin ("axon") overrides JAX_PLATFORMS at import time, so
# force the CPU backend through the config API as well (must run before any
# backend is initialised).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
