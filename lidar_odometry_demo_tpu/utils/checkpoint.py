"""Checkpoint / resume for odometry state.

The reference has no persistence: keyframe map + poses live in RAM and
odometry restarts from identity on every launch (SURVEY.md §5;
lidar_odometry.cpp:15-17). In the TPU build the whole odometry state is one
pytree, so checkpointing is a natural capability: npz for simple host
round-trips and orbax for async multi-host checkpointing of batched fleets.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops import se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.pipeline.odometry import OdometryState


_FIELDS = (
    ["keyframe." + f for f in vm.VoxelMap._fields]
    + ["current.t", "current.q", "previous.t", "previous.q"]
)


def save_npz(path: str, state: OdometryState) -> None:
    flat = {"keyframe." + f: getattr(state.keyframe, f) for f in vm.VoxelMap._fields}
    flat.update(
        {
            "current.t": state.current.t,
            "current.q": state.current.q,
            "previous.t": state.previous.t,
            "previous.q": state.previous.q,
        }
    )
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_npz(path: str) -> OdometryState:
    z = np.load(path)
    missing = [f for f in _FIELDS if f not in z]
    if missing:
        raise ValueError(f"checkpoint missing fields: {missing}")
    return OdometryState(
        keyframe=vm.VoxelMap(
            **{f: jnp.asarray(z["keyframe." + f]) for f in vm.VoxelMap._fields}
        ),
        current=se3.Pose(jnp.asarray(z["current.t"]), jnp.asarray(z["current.q"])),
        previous=se3.Pose(jnp.asarray(z["previous.t"]), jnp.asarray(z["previous.q"])),
    )


def save_orbax(path: str, state: OdometryState) -> None:
    """Orbax checkpoint (async-capable, multi-host-safe) of the state pytree."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: OdometryState) -> OdometryState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=jax.tree.map(np.asarray, like))
    return jax.tree.map(jnp.asarray, restored)
