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
#               immutable physical rows
#   3           keyframe.{tab,origin,kdim}: fused single-array sorted table,
#               136-lane rows (int count lane at MB+1, anchor at MB+2..MB+4)
#   4           keyframe.{tab,origin,kdim}: fused table, 128-lane rows — the
#               redundant int count lane dropped (count lives only as the
#               f32 lane at 3K), key at MB, anchor at MB+1..MB+3;
#               point lanes interleaved xyzxyz
#   5           as v4 but point lanes PLANAR (xx..yy..zz) so the match
#               path reads coordinates as contiguous lane slices
#               (see vm.VoxelMap / vm._lanes)
FORMAT_VERSION = 5


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


def _assemble_tab(keys, count, pts, nrm, anchor) -> vm.VoxelMap:
    """Build a v5 fused table from key-ordered columns (host numpy).

    pts (c, k, 3) interleaved in -> planar x/y/z lane blocks."""
    c, k = pts.shape[0], pts.shape[1]
    rw, mb, w = vm._lanes(k)
    tab = np.zeros((c, w), np.int32)
    tab[:, : 3 * k] = np.swapaxes(pts, 1, 2).reshape(c, 3 * k).view(np.int32)
    tab[:, 3 * k] = count.astype(np.float32).view(np.int32)
    tab[:, rw : rw + 3 * k] = nrm.reshape(c, 3 * k).view(np.int32)
    tab[:, mb] = keys
    tab[:, mb + 1 : mb + 4] = anchor.view(np.int32)
    return tab


def _check_tab_width(z, version: int, expected: int) -> None:
    """Same descriptive error the v5 load branch raises: a truncated or
    malformed legacy npz must fail HERE, not be reinterpreted with
    key/count/anchor sliced from the wrong lanes (ADVICE r4 #4)."""
    got = z["keyframe.tab"].shape[-1]
    if got != expected:
        k = np.asarray(z["keyframe.kdim"]).shape[-1]
        raise ValueError(
            f"v{version} checkpoint table width {got} does not match the "
            f"K={k} lane layout width {expected}"
        )


def _migrate_v3(z) -> vm.VoxelMap:
    """Round-3 136-lane fused table -> v4 128-lane table (drop the int
    count lane; key and anchor shift down one lane)."""
    kdim = np.asarray(z["keyframe.kdim"], np.int32)
    k = kdim.shape[-1]
    rw = -(-(3 * k + 1) // 8) * 8
    mb_chk = -(-(rw + 3 * k) // 8) * 8
    _check_tab_width(z, 3, -(-(mb_chk + 5) // 8) * 8)
    tab_old = np.asarray(z["keyframe.tab"], np.int32)
    mb_old = -(-(rw + 3 * k) // 8) * 8  # v3: key, int count, anchor
    keys = tab_old[:, mb_old]
    count = tab_old[:, mb_old + 1]
    pts = tab_old[:, : 3 * k].view(np.float32).reshape(-1, k, 3)
    nrm = tab_old[:, rw : rw + 3 * k].view(np.float32).reshape(-1, k, 3)
    anchor = tab_old[:, mb_old + 2 : mb_old + 5].view(np.float32)
    tab = _assemble_tab(keys, count, pts, nrm, anchor)
    return vm.VoxelMap(
        tab=jnp.asarray(tab),
        origin=jnp.asarray(z["keyframe.origin"], jnp.int32),
        kdim=jnp.zeros((1, k), jnp.int32),
    )


def _migrate_v4(z) -> vm.VoxelMap:
    """Round-4 interleaved-point 128-lane table -> v5 planar point lanes
    (same widths for every K; only lanes [0:3K) reorder)."""
    kdim = np.asarray(z["keyframe.kdim"], np.int32)
    k = kdim.shape[-1]
    _check_tab_width(z, 4, vm._lanes(k)[2])  # v4 width == v5 width
    tab = np.asarray(z["keyframe.tab"], np.int32).copy()
    pts_il = tab[:, : 3 * k].view(np.float32).reshape(-1, k, 3)
    tab[:, : 3 * k] = np.swapaxes(pts_il, 1, 2).reshape(-1, 3 * k).view(np.int32)
    return vm.VoxelMap(
        tab=jnp.asarray(tab),
        origin=jnp.asarray(z["keyframe.origin"], jnp.int32),
        kdim=jnp.zeros((1, k), jnp.int32),
    )


def _migrate_v1(z) -> vm.VoxelMap:
    """Round-1 layout: payload already in key order."""
    keys = np.asarray(z["keyframe.keys"], np.int32)
    count = np.asarray(z["keyframe.count"], np.int32)
    pts = np.asarray(z["keyframe.pts"], np.float32)
    nrm = np.asarray(z["keyframe.nrm"], np.float32)
    tab = _assemble_tab(keys, count, pts, nrm, pts[:, 0, :])
    return vm.VoxelMap(
        tab=jnp.asarray(tab),
        origin=jnp.asarray(z["keyframe.origin"], jnp.int32),
        kdim=jnp.zeros((1, pts.shape[1]), jnp.int32),
    )


def _migrate_v2(z) -> vm.VoxelMap:
    """Round-2 layout: sorted meta index over physical payload rows."""
    meta = np.asarray(z["keyframe.meta"], np.int32)
    pts = np.asarray(z["keyframe.pts"], np.float32)
    nrm = np.asarray(z["keyframe.nrm"], np.float32)
    keys, count, row = meta[:, 0], meta[:, 1], meta[:, 2]
    anchor = meta[:, 3:6].view(np.float32)
    tab = _assemble_tab(keys, count, pts[row], nrm[row], anchor)
    return vm.VoxelMap(
        tab=jnp.asarray(tab),
        origin=jnp.asarray(z["keyframe.origin"], jnp.int32),
        kdim=jnp.zeros((1, pts.shape[1]), jnp.int32),
    )


def load_npz(path: str) -> OdometryState:
    z = np.load(path)
    if "keyframe.tab" in z:
        missing = [f for f in _FIELDS if f not in z]
        if missing:
            raise ValueError(
                f"checkpoint missing fields: {missing} (format version "
                f"{int(z['format_version']) if 'format_version' in z else '?'},"
                f" expected {FORMAT_VERSION})"
            )
        # v3 vs v4 MUST branch on the stored format_version: both layouts
        # yield identical table widths for many max_points values (e.g.
        # K=5,7,8,10,...), so a width compare silently loads a v3 table
        # unmigrated with key/anchor read from the wrong lanes (ADVICE r3 #2)
        version = int(z["format_version"]) if "format_version" in z else 3
        if version == 3:
            keyframe = _migrate_v3(z)  # round-3 136-lane layout
        elif version == 4:
            keyframe = _migrate_v4(z)  # interleaved -> planar point lanes
        elif version == FORMAT_VERSION:
            k = np.asarray(z["keyframe.kdim"]).shape[-1]
            if z["keyframe.tab"].shape[-1] != vm._lanes(k)[2]:
                raise ValueError(
                    f"v{version} checkpoint table width "
                    f"{z['keyframe.tab'].shape[-1]} does not match the "
                    f"K={k} lane layout width {vm._lanes(k)[2]}"
                )
            keyframe = vm.VoxelMap(
                **{f: jnp.asarray(z["keyframe." + f]) for f in vm.VoxelMap._fields}
            )
        else:
            raise ValueError(
                f"unknown checkpoint format_version {version} "
                f"(this build reads v1-v{FORMAT_VERSION})"
            )
    elif "keyframe.meta" in z:
        keyframe = _migrate_v2(z)  # round-2 layout
    elif "keyframe.keys" in z:
        keyframe = _migrate_v1(z)  # round-1 layout
    else:
        raise ValueError(
            "unrecognized checkpoint layout: expected keyframe.tab (v3), "
            "keyframe.meta (v2) or keyframe.keys (v1); the voxel-map layout "
            "changed to a fused single-array sorted table in v3"
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
