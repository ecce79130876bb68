"""Test configuration: force an 8-virtual-device CPU platform.

Tests run on CPU (with 8 virtual devices for sharding tests) regardless of
whether a real TPU is attached; benchmarks (`bench.py`) use the real chip.
The axon sitecustomize imports jax at interpreter startup, so the platform
must be switched via jax.config (env vars are too late), and XLA_FLAGS must
be set before the CPU backend is first initialised.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)


def pytest_configure(config):
    config.addinivalue_line("markers", "x64: test requires jax_enable_x64")


@pytest.fixture
def enable_x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)
