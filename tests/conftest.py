"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested without TPUs via
xla_force_host_platform_device_count (SURVEY.md §4 "Multi-node testing").

Note: this environment's sitecustomize imports jax at interpreter startup,
so plain `os.environ` assignments here are too late for JAX_PLATFORMS —
we must go through jax.config.update instead, which works after import as
long as no backend has initialized yet.
"""

import os

# Must be set before the XLA CPU client is created (conftest runs early
# enough for that even though jax is already imported).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
