"""Multi-host execution helpers (TPU pod slices / CPU test fabric).

The reference is strictly single-process (SURVEY.md §2: no distributed
layer). For the TPU build, multi-host scaling (BASELINE.json config 5:
N>=2 hosts) uses the standard JAX recipe: jax.distributed.initialize once
per process, then build meshes over jax.devices() — every sharded program
in this package (parallel/batched.py, parallel/pose_graph.py, the sp-sharded
ICP) is mesh-agnostic and runs unchanged on a pod slice, with psum riding
ICI within a slice and DCN across slices.

On a single machine the same code paths are exercised with
xla_force_host_platform_device_count (tests/conftest.py) and by the
driver's dryrun_multichip.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX. On TPU pods all arguments are auto-detected
    from the environment; on CPU/GPU fabrics pass them explicitly."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(dp: int | None = None, sp: int = 1):
    """Mesh over all global devices: dp defaults to n_devices // sp."""
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    if dp is None:
        dp = len(devs) // sp
    return Mesh(np.asarray(devs[: dp * sp]).reshape(dp, sp), ("dp", "sp"))


def scaling_report(mesh, scans_per_sec: float, baseline_single: float) -> dict:
    """Scaling-efficiency record (BASELINE.json: >=80% to N hosts)."""
    n = mesh.devices.size
    ideal = baseline_single * n
    return {
        "devices": int(n),
        "scans_per_sec": scans_per_sec,
        "single_device_scans_per_sec": baseline_single,
        "scaling_efficiency": scans_per_sec / ideal if ideal > 0 else 0.0,
    }
