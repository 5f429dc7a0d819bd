#!/bin/bash
# One serialized TPU measurement session for round 4. Each step has a
# generous timeout and logs incrementally to /tmp/r04_*.txt; steps
# continue even if a predecessor fails (the tunnel recovers between
# processes). Run from /root/repo. NEVER run two of these concurrently.
set -u
cd /root/repo

probe() {
  echo "--- probe $(date +%H:%M:%S)"
  timeout 1500 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((2048,2048)); v=float((x@x).sum())
print('tpu ok after', round(time.time()-t0,1), 's', flush=True)" 2>&1 | grep -v WARNING
}

probe
echo "--- bisect A (scatter desc) $(date +%H:%M:%S)"
LIDAR_DESC_SCAN=0 timeout 1200 python scripts/bisect_hot.py 50 > /tmp/r04_bisect_scatter.txt 2>&1
grep -v WARNING /tmp/r04_bisect_scatter.txt | tail -8

probe
echo "--- bisect B (scan desc) $(date +%H:%M:%S)"
LIDAR_DESC_SCAN=1 timeout 1200 python scripts/bisect_hot.py 50 > /tmp/r04_bisect_scan.txt 2>&1
grep -v WARNING /tmp/r04_bisect_scan.txt | tail -8

probe
echo "--- bench $(date +%H:%M:%S)"
timeout 900 python bench.py > /tmp/r04_bench.txt 2>&1
grep -v WARNING /tmp/r04_bench.txt | tail -8

probe
echo "--- pallas A/B B=1 $(date +%H:%M:%S)"
timeout 1500 python scripts/pallas_match_bench.py 1 > /tmp/r04_pallas1.txt 2>&1
grep -v WARNING /tmp/r04_pallas1.txt | tail -8

echo "--- session done $(date +%H:%M:%S)"
