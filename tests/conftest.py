"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding is validated on simulated host devices
(``--xla_force_host_platform_device_count``); the real TPU chip is exercised
by bench.py, not the unit suite.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
