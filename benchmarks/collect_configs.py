"""Run every BASELINE config via run_configs.py subprocesses and write the
combined artifact BENCH_CONFIGS_r{N}.json (VERDICT r3 next-round #3).

Configs 1-4 + 6 run on the default backend (the TPU when available);
config 5 (distributed Schur refinement) runs on the 8-device CPU mesh as
in r3 (multi-chip hardware is not available — the CPU fabric exercises
the identical shard_map program).

Usage: python benchmarks/collect_configs.py [--out PATH] [--round N]
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(cfg: int, extra=()):
    cmd = [sys.executable, os.path.join(HERE, "run_configs.py"), str(cfg),
           *extra]
    print(f"--- config {cfg}: {' '.join(cmd[1:])}", file=sys.stderr, flush=True)
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=1500)
    if p.returncode != 0:
        return {"metric": f"config{cfg}", "error": p.stderr[-800:]}
    line = p.stdout.strip().splitlines()[-1]
    print(line, file=sys.stderr, flush=True)
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--round", type=int, default=4)
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        REPO, f"BENCH_CONFIGS_r{args.round:02d}.json")

    results = []
    results.append(run_one(1))
    results.append(run_one(2))
    results.append(run_one(3))
    results.append(run_one(4))
    results.append(run_one(5, ["--cpu"]))
    results.append(run_one(6))

    import jax

    report = {
        "round": args.round,
        "device": str(jax.devices()[0]),
        "configs": results,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
