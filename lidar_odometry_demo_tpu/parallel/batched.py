"""Multi-sequence batched odometry over a (dp, sp) device mesh.

Throughput scaling for the TPU build (BASELINE.json configs 4-5): the scan
loop is serial *within* a sequence (pose feeds the next deskew,
lidar_odometry.cpp:27-30), so fleet throughput comes from processing many
sequences in parallel:

- dp axis: independent sequences sharded across devices (embarrassingly
  parallel — each device carries its own odometry states + voxel maps),
- sp axis: within each sequence, the ICP hot loop sharded over query
  points with one psum of the 6x6 normal equations per GN iteration.

Both are expressed with shard_map over a standard Mesh: the same program
runs on the CPU test fabric and a TPU pod slice. vmap supplies per-device
batching (multiple sequences per device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.ops.cloud import LidarScan
from lidar_odometry_demo_tpu.pipeline import odometry


def init_batched_state(cfg: OdometryConfig, batch: int) -> odometry.OdometryState:
    """Stacked odometry states for `batch` independent sequences."""
    one = odometry.init_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch, *x.shape)).copy(), one)


def make_batched_step(cfg: OdometryConfig, mesh: Mesh):
    """(state_batch, scan_batch) -> (state_batch, diag_batch), dp+sp sharded.

    Batch axis must be divisible by the mesh's dp size; each dp shard runs
    vmap over its local sequences. The scan/state pytrees are sharded on
    the dp axis and replicated over sp; inside, the ICP solve psums over sp.
    """
    sp = mesh.shape["sp"]
    step = odometry.make_process_scan(cfg, sp_axis="sp" if sp > 1 else None)
    vstep = jax.vmap(step)

    @jax.jit
    def run(state_b: odometry.OdometryState, scan_b: LidarScan):
        f = jax.shard_map(
            vstep,
            mesh=mesh,
            in_specs=(P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")),
            check_vma=False,
        )
        return f(state_b, scan_b)

    return run


def make_batched_sequence_runner(cfg: OdometryConfig, mesh: Mesh):
    """lax.scan over time of the dp+sp sharded batched step.

    scans_b: LidarScan pytree with leading (S, B, ...) axes (time, batch).
    """
    sp = mesh.shape["sp"]
    step = odometry.make_process_scan(cfg, sp_axis="sp" if sp > 1 else None)
    vstep = jax.vmap(step)

    def scan_over_time(state_b, scans_b):
        return jax.lax.scan(vstep, state_b, scans_b)

    @jax.jit
    def run(state_b: odometry.OdometryState, scans_b: LidarScan):
        f = jax.shard_map(
            scan_over_time,
            mesh=mesh,
            in_specs=(P("dp"), P(None, "dp")),
            out_specs=(P("dp"), P(None, "dp")),
            check_vma=False,
        )
        return f(state_b, scans_b)

    return run
