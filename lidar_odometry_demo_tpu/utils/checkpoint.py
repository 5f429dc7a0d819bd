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
#   6           keyframe.{tab,keys,count,origin,kdim}: keys and counts
#               move OUT of the table into separate (C,) vectors (they
#               fall out of the per-scan merge sort for free; stamping
#               them back into lanes cost 0.44 ms/scan — vm._lanes).
#               The key lane is gone; anchor shifts to MB..MB+3; the f32
#               lane at 3K remains as the search copy of the count.
FORMAT_VERSION = 6


def _legacy_lanes_v45(k: int):
    """Row-lane layout of formats v4-v5 (key lane at MB, anchor MB+1..MB+4)."""
    a8 = lambda n: -(-n // 8) * 8
    rw = a8(3 * k + 1)
    mb = rw + 3 * k
    return rw, mb, a8(mb + 4)


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


def _assemble_map(keys, count, pts, nrm, anchor, origin) -> vm.VoxelMap:
    """Build a v6 map from key-ordered columns (host numpy).

    pts (c, k, 3) interleaved in -> planar x/y/z lane blocks; count
    lands both in the count vector and the in-row f32 search lane."""
    c, k = pts.shape[0], pts.shape[1]
    rw, mb, w = vm._lanes(k)
    tab = np.zeros((c, w), np.int32)
    tab[:, : 3 * k] = np.swapaxes(pts, 1, 2).reshape(c, 3 * k).view(np.int32)
    tab[:, 3 * k] = count.astype(np.float32).view(np.int32)
    tab[:, rw : rw + 3 * k] = nrm.reshape(c, 3 * k).view(np.int32)
    tab[:, mb : mb + 3] = anchor.view(np.int32)
    return vm.VoxelMap(
        tab=jnp.asarray(tab),
        keys=jnp.asarray(keys.astype(np.int32)),
        count=jnp.asarray(count.astype(np.int32)),
        origin=jnp.asarray(origin, jnp.int32),
        kdim=jnp.zeros((1, k), jnp.int32),
    )


def _check_tab_width(z, version: int, expected: int) -> None:
    """Descriptive width validation for every load path: a truncated or
    malformed npz must fail HERE, not be reinterpreted with
    key/count/anchor sliced from the wrong lanes (ADVICE r4 #4)."""
    got = z["keyframe.tab"].shape[-1]
    if got != expected:
        k = np.asarray(z["keyframe.kdim"]).shape[-1]
        raise ValueError(
            f"v{version} checkpoint table width {got} does not match the "
            f"K={k} lane layout width {expected}"
        )


def _migrate_v3(z) -> vm.VoxelMap:
    """Round-3 136-lane fused table (int count lane; interleaved points)."""
    kdim = np.asarray(z["keyframe.kdim"], np.int32)
    k = kdim.shape[-1]
    rw = -(-(3 * k + 1) // 8) * 8
    mb_old = -(-(rw + 3 * k) // 8) * 8  # v3: key, int count, anchor
    _check_tab_width(z, 3, -(-(mb_old + 5) // 8) * 8)
    tab_old = np.asarray(z["keyframe.tab"], np.int32)
    keys = tab_old[:, mb_old]
    count = tab_old[:, mb_old + 1]
    pts = tab_old[:, : 3 * k].view(np.float32).reshape(-1, k, 3)
    nrm = tab_old[:, rw : rw + 3 * k].view(np.float32).reshape(-1, k, 3)
    anchor = tab_old[:, mb_old + 2 : mb_old + 5].view(np.float32)
    return _assemble_map(keys, count, pts, nrm, anchor,
                         np.asarray(z["keyframe.origin"], np.int32))


def _migrate_v4(z, planar: bool) -> vm.VoxelMap:
    """Round-4/5 128-lane tables (key at MB, anchor MB+1..MB+4, f32 count
    at 3K). planar=False (v4): point lanes interleaved xyzxyz;
    planar=True (v5): already planar."""
    kdim = np.asarray(z["keyframe.kdim"], np.int32)
    k = kdim.shape[-1]
    rw, mb, w_old = _legacy_lanes_v45(k)
    _check_tab_width(z, 5 if planar else 4, w_old)
    tab = np.asarray(z["keyframe.tab"], np.int32)
    keys = tab[:, mb]
    count = tab[:, 3 * k].view(np.float32).astype(np.int32)
    raw_pts = tab[:, : 3 * k].view(np.float32)
    if planar:
        pts = np.swapaxes(raw_pts.reshape(-1, 3, k), 1, 2)  # planar -> (c,k,3)
    else:
        pts = raw_pts.reshape(-1, k, 3)
    nrm = tab[:, rw : rw + 3 * k].view(np.float32).reshape(-1, k, 3)
    anchor = tab[:, mb + 1 : mb + 4].view(np.float32)
    return _assemble_map(keys, count, pts, nrm, anchor,
                         np.asarray(z["keyframe.origin"], np.int32))


def _migrate_v1(z) -> vm.VoxelMap:
    """Round-1 layout: payload already in key order."""
    keys = np.asarray(z["keyframe.keys"], np.int32)
    count = np.asarray(z["keyframe.count"], np.int32)
    pts = np.asarray(z["keyframe.pts"], np.float32)
    nrm = np.asarray(z["keyframe.nrm"], np.float32)
    return _assemble_map(keys, count, pts, nrm, pts[:, 0, :].copy(),
                         np.asarray(z["keyframe.origin"], np.int32))


def _migrate_v2(z) -> vm.VoxelMap:
    """Round-2 layout: sorted meta index over physical payload rows."""
    meta = np.asarray(z["keyframe.meta"], np.int32)
    pts = np.asarray(z["keyframe.pts"], np.float32)
    nrm = np.asarray(z["keyframe.nrm"], np.float32)
    keys, count, row = meta[:, 0], meta[:, 1], meta[:, 2]
    anchor = meta[:, 3:6].copy().view(np.float32)
    return _assemble_map(keys, count, pts[row], nrm[row], anchor,
                         np.asarray(z["keyframe.origin"], np.int32))


def load_npz(path: str) -> OdometryState:
    z = np.load(path)
    if "keyframe.tab" in z:
        # v3 vs v4 vs v5 MUST branch on the stored format_version: the
        # layouts yield identical table widths for many max_points values,
        # so a width compare silently loads an old table unmigrated with
        # key/count/anchor read from the wrong lanes (ADVICE r3 #2)
        version = int(z["format_version"]) if "format_version" in z else 3
        if version == 3:
            keyframe = _migrate_v3(z)  # round-3 136-lane layout
        elif version in (4, 5):
            keyframe = _migrate_v4(z, planar=version == 5)
        elif version == FORMAT_VERSION:
            missing = [f for f in _FIELDS if f not in z]
            if missing:
                raise ValueError(
                    f"checkpoint missing fields: {missing} "
                    f"(format version {version})"
                )
            k = np.asarray(z["keyframe.kdim"]).shape[-1]
            _check_tab_width(z, version, vm._lanes(k)[2])
            c = z["keyframe.tab"].shape[0]
            for f in ("keys", "count"):
                if z["keyframe." + f].shape != (c,):
                    raise ValueError(
                        f"v{version} checkpoint keyframe.{f} shape "
                        f"{z['keyframe.' + f].shape} does not match the "
                        f"table capacity ({c},)"
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
    elif "keyframe.keys" in z and "keyframe.pts" in z:
        keyframe = _migrate_v1(z)  # round-1 layout
    else:
        raise ValueError(
            "unrecognized checkpoint layout: expected keyframe.tab (v3+), "
            "keyframe.meta (v2) or keyframe.keys+pts (v1); the voxel-map "
            "layout changed to a fused single-array sorted table in v3"
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
