"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

The environment boots every interpreter with the single-process TPU plugin
already registered and ``JAX_PLATFORMS`` pointing at it (sitecustomize), so
env vars set here are too late — but jax *backends* initialize lazily, so
``jax.config.update`` can still steer the suite onto 8 virtual CPU devices
before the first computation.  This keeps the unit suite off the (single
-process) TPU chip and gives real multi-device coverage.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


def pytest_collection_modifyitems(items):
    # jax deprecation FutureWarnings (e.g. unsafe scatter dtype casts)
    # become hard errors in future releases — fail the suite at the
    # warning stage instead of discovering the break on a toolchain bump
    for item in items:
        item.add_marker(
            pytest.mark.filterwarnings("error::FutureWarning:jax"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
