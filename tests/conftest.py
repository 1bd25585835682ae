"""Test harness: CPU backend with a fake 8-device mesh + exact f64.

This is the Maxeler-simulation-mode analog (SURVEY.md §4): all kernel
logic (including Pallas kernels, via interpret mode) and all multi-chip
sharding logic run on CPU without TPU hardware.  The axon sitecustomize
imports jax at interpreter start, so JAX_PLATFORMS in os.environ is too
late — we override through jax.config instead (verified working in this
container)."""

import os

# Must precede first backend initialization (not merely jax import).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture()
def tmp_tuner_cache(tmp_path):
    from cask_tpu.tune.cache import TunerCache

    return TunerCache(path=str(tmp_path / "tuner.json"))
