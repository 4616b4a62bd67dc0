"""Test harness: force an 8-device virtual CPU mesh before jax initialises.

The real target is a TPU mesh; multi-chip paths are validated on CPU via
``xla_force_host_platform_device_count`` (the image pins JAX_PLATFORMS=axon
for the single real TPU chip, so the platform is overridden in-process)."""

import os
import tempfile

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
# keep test-measured build rates out of the machine's real calibration
# store (utils/calibration.py)
os.environ["MCMC_COLORER_CALIBRATION"] = os.path.join(
    tempfile.mkdtemp(prefix="mcmc_cal_"), "calibration.json"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from mcmc_colorer_tpu.graph.generate import erdos_renyi


@pytest.fixture(scope="session")
def small_er():
    """ER(60, 0.2): small but dense enough to have conflicts at init."""
    return erdos_renyi(60, 0.2, seed=7)


@pytest.fixture(scope="session")
def medium_er():
    return erdos_renyi(500, 0.05, seed=3)
