"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests (pjit/shard_map) run unchanged on CPU devices;
the driver separately dry-run-compiles the multichip path.  This must run
before jax initializes a backend, hence the early config here.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
