"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (the driver validates multi-chip
sharding the same way, via xla_force_host_platform_device_count).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest
import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; override before any backend is initialized so tests run locally.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
