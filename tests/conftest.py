"""Test configuration: run JAX on CPU with 8 virtual devices.

This emulates a TPU v5e-8 topology for sharding tests without TPU hardware
(SURVEY.md section 4) and keeps the suite fast/deterministic.  Must run
before jax is imported anywhere.
"""
import os

_TPU_MODE = os.environ.get("MMT_TPU_TESTS") == "1"

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (registered via sitecustomize on this image) forces
# jax_platforms="axon,cpu" regardless of the environment; override it at
# config level so the suite genuinely runs on the 8-device virtual CPU
# mesh instead of competing for the single TPU tunnel.  With
# MMT_TPU_TESTS=1 the platform is left alone so @pytest.mark.tpu tests
# (ladder-vs-scan-vs-oracle on the real chip) see the hardware -- run
# that mode as `MMT_TPU_TESTS=1 pytest -m tpu tests/`.
import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if _TPU_MODE:
        # TPU mode runs ONLY the hardware regression subset: everything
        # else assumes the 8-device virtual CPU mesh
        skip_cpu = pytest.mark.skip(
            reason="MMT_TPU_TESTS=1 runs only the @pytest.mark.tpu subset"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip_cpu)
        return
    skip_tpu = pytest.mark.skip(
        reason="needs the real TPU chip (set MMT_TPU_TESTS=1)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(seed=1234)
