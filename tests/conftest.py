"""Test harness: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are validated on this virtual mesh; the real
TPU is exercised by bench.py, not the unit tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU: the environment's sitecustomize registers the 'axon' TPU
# plugin and overrides jax_platforms via jax.config, so the env var alone
# is not enough — set the config knob after import, before first use.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
