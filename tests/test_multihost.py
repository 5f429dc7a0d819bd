"""REAL multi-process execution: 2 jax.distributed processes x 4 virtual
CPU devices run the dp-sharded odometry fleet as one SPMD program
(BASELINE config 5's N>=2 shape, on the CPU fabric).

This is the only test that crosses a process boundary; everything else in
tests/ uses the single-process 8-device fabric. It spawns
scripts/multihost_demo.py twice (fresh interpreters — jax.distributed
cannot be re-initialized inside this pytest process) and checks the
written scaling report.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_fleet(tmp_path):
    port = _free_port()
    out = tmp_path / "report.json"
    env = dict(os.environ)
    # the demo sets its own XLA flags; scrub pytest's fabric settings
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def spawn(pid):
        return subprocess.Popen(
            [
                sys.executable, os.path.join(REPO, "scripts", "multihost_demo.py"),
                "--nprocs", "2", "--pid", str(pid), "--port", str(port),
                "--local-devices", "4", "--scans", "10", "--width", "450",
            ]
            + (["--out", str(out)] if pid == 0 else []),
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )

    p0, p1 = spawn(0), spawn(1)
    try:
        out0, err0 = p0.communicate(timeout=360)
        out1, err1 = p1.communicate(timeout=60)
    except subprocess.TimeoutExpired:
        p0.kill()
        p1.kill()
        raise
    assert p0.returncode == 0, err0.decode()[-2000:]
    assert p1.returncode == 0, err1.decode()[-2000:]

    report = json.loads(out.read_text())
    assert report["scaling"]["processes"] == 2
    assert report["scaling"]["devices"] == 8
    assert report["lanes"] == 8
    # all 8 lanes (spread over both processes) reproduced the single-device
    # trajectory at a MEANINGFUL shape (W=450, 10 scans: per-lane work
    # dominates dispatch noise; the drive visibly moves).
    assert report["max_lane_vs_single_dt"] < 1e-3, report
    import numpy as np
    assert np.linalg.norm(report["final_t"]) > 0.1, report
    # Calibrated scaling bars for THIS fabric (8 virtual devices over 2
    # physical cores — see multihost.demo_worker docstring). Measured on
    # 2026-08-20: machine_utilization_ratio 1.29, scaling_efficiency 0.16
    # against a core-limited ceiling of cores/devices = 0.25. The floors
    # below catch real regressions (the r2 anti-scaling bug scored ~0.5
    # on the ratio) while leaving ~2x noise margin; the >=80% BASELINE
    # target applies to real pod slices where devices do not share cores.
    assert report["machine_utilization_ratio"] > 0.7, report
    ceiling = min(1.0, (report["host_cpu_count"] or 1) / report["lanes"])
    assert report["scaling"]["scaling_efficiency"] > 0.35 * ceiling, report
