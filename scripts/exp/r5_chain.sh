#!/bin/bash
# Round-5 measurement chain A — hardened per r4 verdict Weak #5/#7:
#   * set -o pipefail is NOT enough when the display filter is the last
#     pipe stage, so each step writes its FULL output to a file and the
#     filter runs on the file afterwards — rc is the command's own.
#   * a cheap TPU health probe runs BEFORE every step; after a worker
#     crash the probe retries (worker restart takes ~1-2 min) so one
#     crash cannot zero out the rest of the chain.
#   * risky/expensive compiles (new refine code, full bench) run LAST.
# Usage: nohup bash scripts/exp/r5_chain.sh > /tmp/r5a_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1

probe() {
  for i in $(seq 1 30); do
    timeout 900 python - >/dev/null 2>&1 <<'EOF' && return 0
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
x = jnp.ones((256, 256))
assert float(jnp.sum(x @ x)) == 16777216.0
EOF
    echo "--- probe failed (attempt $i) $(date +%H:%M:%S); waiting 120s"
    sleep 120
  done
  return 1
}

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name START $(date +%H:%M:%S) ==="
  if ! probe; then
    echo "=== $name SKIPPED: TPU unhealthy after 30 probes ==="
    return 1
  fi
  timeout "$tmo" "$@" > "/tmp/r5_step_${name}.out" 2>&1
  local rc=$?
  grep -vE "WARNING|sitecustomize" "/tmp/r5_step_${name}.out" | tail -50
  echo "=== $name rc=$rc END $(date +%H:%M:%S) ==="
  return $rc
}

# 1. to_band carry A/B at 8192 (settle the r4h anomaly; expect n-layout
#    ~0.35 s, t-layout ~1.6 s)
N=8192 SPLITS=8 EK_QR_PANEL=n step toband8k_n 1800 python scripts/exp/exp30_toband_split.py
N=8192 SPLITS=8 EK_QR_PANEL=t step toband8k_t 1800 python scripts/exp/exp30_toband_split.py

# 2. to_band at 16384 with the restored layout (expect ~1.75 s)
N=16384 SPLITS=8 EK_QR_PANEL=n step toband16k_n 2700 python scripts/exp/exp30_toband_split.py

# 3. two-stage e2e at 16384 with stage breakdown (flagship check)
N=16384 step eigensx16k 3600 python scripts/exp/exp13_eigensx16k.py

# 4. selecting lowest-500 of 16384 at HEAD (r3: 7.59 s; target <= 4 s)
N=16384 K=500 step select16k 3600 python scripts/exp/exp15_select16k.py

# 5. chase shear=roll retry (failed remote compile in r3s6; cheap A/B at
#    4096 — a clean compile failure exits fast)
N=4096 SHEARS=net,roll step chase_roll4k 2700 python scripts/exp/exp23_chase_shear.py

# 6. NEW column-blocked refine at 16384 (risky: fresh compiles + the r4
#    OOM territory) — auto mode routes to refine_stepwise
N=16384 step refine16k 5400 python scripts/exp/exp19_refine16k.py

# 7. full bench (warms every cache key the driver's end-of-round run needs)
step bench_full 10800 python bench.py

echo "=== CHAIN R5A ALL DONE $(date +%H:%M:%S) ==="
