"""Multi-process (N>=2) odometry fleet demo — BASELINE config 5 harness.

Each process owns a slice of the device mesh; together they run the
dp-sharded batched odometry fleet as ONE SPMD program (psum/collectives
across processes). On a TPU pod slice run one process per host with no
arguments (jax.distributed auto-detects); on the CPU test fabric:

    python scripts/multihost_demo.py --nprocs 2 --pid 0 --port 9876 \
        --local-devices 4 --out /tmp/report.json &
    python scripts/multihost_demo.py --nprocs 2 --pid 1 --port 9876 \
        --local-devices 4 &

tests/test_multihost.py launches exactly this 2-process setup.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--port", type=int, default=9876)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--scans", type=int, default=4)
    ap.add_argument("--width", type=int, default=None,
                    help="azimuth columns (>=450 for meaningful timing)")
    args = ap.parse_args()

    if args.nprocs is not None:
        # CPU test fabric: flags must land before the backend initializes
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

        from lidar_odometry_demo_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.pid,
        )
    else:
        import jax  # noqa: F401

        from lidar_odometry_demo_tpu.parallel import multihost

        multihost.initialize()  # TPU pod: auto-detected

    import jax

    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global devices",
        file=sys.stderr,
    )
    report = multihost.demo_worker(out_path=args.out, n_scans=args.scans,
                                   width=args.width)
    if jax.process_index() == 0:
        print(report)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
