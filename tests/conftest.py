"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on the XLA host platform with 8 virtual devices, per the reference
rebuild's test strategy (SURVEY.md §4).
"""

import os

# Hard override: the ambient environment pre-sets JAX_PLATFORMS to the
# remote-TPU platform AND imports jax from sitecustomize at interpreter
# startup, so the env var alone is read too early to override — the config
# update below is what actually forces CPU (backends are not yet
# initialized when conftest runs).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
