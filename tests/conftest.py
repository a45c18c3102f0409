"""Test configuration: force an 8-device virtual CPU mesh.

The container's axon sitecustomize pins JAX_PLATFORMS=axon (real TPU tunnel);
tests must run on a local 8-device CPU mesh instead (SURVEY.md section 4), so
we override the platform via jax.config after import — the env var is ignored.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
