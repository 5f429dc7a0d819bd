"""Device mesh helpers.

The reference is single-process shared-memory (SURVEY.md §2: parallel STL
only, no distributed layer). The TPU build's scaling axes
(BASELINE.json north_star):

- dp: data parallelism over independent sequences/logs,
- sp: spatial parallelism inside one sequence — correspondence search and
  the 6x6 normal-equation reduction sharded over query points, combined
  with one psum per GN iteration over ICI.

Meshes are standard jax.sharding.Mesh objects; everything works identically
on a real pod slice and on the CPU xla_force_host_platform_device_count
test fabric.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def default_mesh() -> Mesh:
    """All local devices on the dp axis."""
    return make_mesh(dp=len(jax.devices()), sp=1)
