"""Test environment: force CPU with 8 virtual devices (SURVEY.md §4b).

Only one physical TPU v5e chip is attached (via a tunneled 'axon' platform
pinned by the ambient JAX_PLATFORMS); all tests run on a simulated 8-device
CPU mesh instead. A pytest plugin imports jax before this conftest runs, so
env vars alone are too late — ``jax.config.update`` still works because the
backend is initialized lazily on first use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
