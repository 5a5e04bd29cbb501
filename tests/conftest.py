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
