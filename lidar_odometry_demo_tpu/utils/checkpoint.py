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

# npz layout versions:
#   (untagged)  round-1 layout: keyframe.{keys,count,pts,nrm,origin} with the
#               payload permuted into key order (no physical indirection)
#   2           keyframe.{meta,occ,pts,nrm,origin}: sorted logical index over
#               immutable physical rows (see vm.VoxelMap)
FORMAT_VERSION = 2


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
    flat["format_version"] = np.int32(FORMAT_VERSION)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def _migrate_v1(z) -> vm.VoxelMap:
    """Round-1 layout -> current: payload was stored in key order, so the
    physical row of logical slot i is i itself."""
    keys = np.asarray(z["keyframe.keys"], np.int32)
    count = np.asarray(z["keyframe.count"], np.int32)
    pts = np.asarray(z["keyframe.pts"], np.float32)
    nrm = np.asarray(z["keyframe.nrm"], np.float32)
    c = keys.shape[0]
    row = np.arange(c, dtype=np.int32)
    anchor = pts[:, 0, :]
    meta = np.concatenate(
        [
            keys[:, None], count[:, None], row[:, None],
            anchor.view(np.int32), np.zeros((c, 2), np.int32),
        ],
        axis=1,
    )
    occ = keys != np.int32(0x7FFFFFFF)
    return vm.VoxelMap(
        meta=jnp.asarray(meta),
        occ=jnp.asarray(occ),
        pts=jnp.asarray(pts),
        nrm=jnp.asarray(nrm),
        origin=jnp.asarray(z["keyframe.origin"], jnp.int32),
    )


def load_npz(path: str) -> OdometryState:
    z = np.load(path)
    if "format_version" not in z and "keyframe.keys" in z:
        keyframe = _migrate_v1(z)  # legacy round-1 checkpoint
    else:
        version = int(z["format_version"]) if "format_version" in z else None
        missing = [f for f in _FIELDS if f not in z]
        if missing:
            raise ValueError(
                f"checkpoint missing fields: {missing} (file format version "
                f"{version}, expected {FORMAT_VERSION}; the voxel-map layout "
                f"changed in v2: keys/count/pts/nrm -> meta/occ with physical-"
                f"row indirection)"
            )
        keyframe = vm.VoxelMap(
            **{f: jnp.asarray(z["keyframe." + f]) for f in vm.VoxelMap._fields}
        )
    return OdometryState(
        keyframe=keyframe,
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
