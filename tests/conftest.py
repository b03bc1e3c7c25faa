"""Test configuration: run JAX on CPU with 8 virtual devices.

This emulates a TPU v5e-8 topology for sharding tests without TPU hardware
(SURVEY.md section 4) and keeps the suite fast/deterministic.  Must run
before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (registered via sitecustomize on this image) forces
# jax_platforms="axon,cpu" regardless of the environment; override it at
# config level so the suite genuinely runs on the 8-device virtual CPU
# mesh instead of competing for the single TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(seed=1234)
