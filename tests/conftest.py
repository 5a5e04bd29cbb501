"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

The environment's axon sitecustomize force-registers the TPU backend
and sets jax_platforms="axon,cpu", so an env var alone is not enough —
we override the config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Bound compiled-executable memory growth across the (long) suite:
    one pytest process accumulates every module's jitted executables,
    which on this 1-CPU host has produced rare flaky SIGSEGVs deep into
    the run. Modules don't share compilations, so dropping caches at
    module teardown costs nothing."""
    yield
    jax.clear_caches()
