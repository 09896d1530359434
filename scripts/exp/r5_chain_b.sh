#!/bin/bash
# Round-5 chain B: waits for chain A (pid file), then runs the follow-up
# measurements.  Same hardening as r5_chain.sh.
# Usage: nohup bash scripts/exp/r5_chain_b.sh > /tmp/r5b_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1

if [ -f /tmp/r5a.pid ]; then
  while kill -0 "$(cat /tmp/r5a.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "=== chain A finished; starting B $(date +%H:%M:%S) ==="

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
  grep -vE "WARNING|sitecustomize" "/tmp/r5_step_${name}.out" | tail -60
  echo "=== $name rc=$rc END $(date +%H:%M:%S) ==="
  return $rc
}

# 1. in-pipeline stage breakdown at HEAD (the exp24 method that read
#    to_band 0.354 s at 8192 on r3s8) — discriminates "exp30 measures
#    differently" from "the device/to_band is slower now"
N=8192 SPLITS=2,4,8 step toband8k_splits 2700 python scripts/exp/exp30_toband_split.py
N=8192 step stages8k 2700 python scripts/exp/exp24_stage_breakdown.py
N=16384 step stages16k 3600 python scripts/exp/exp24_stage_breakdown.py

# 2. chase compute split at 16384: dbg=3 (shear-only) vs dbg=0 (IO) vs
#    dbg=2 (full) — sizes the shear share of the 3.0 s compute plateau
N=16384 DBGS=10,0,3,2 IOS=lane FUSES=8 step chase_dbg3 3600 python scripts/exp/exp16_chase_profile.py

# 2b. chase-store repack A/B at 16384 (scatter vs roll-shear)
N=16384 step repack16k 3600 python scripts/exp/exp34_repack_ab.py

# 3. first M=32768 datapoint: selecting lowest-500, one-stage core
#    (fits 16 GB; evidence/BUDGET_32K_r5.md).  Long compile expected.
step select32k 10800 python scripts/exp/exp33_select32k.py

echo "=== CHAIN R5B ALL DONE $(date +%H:%M:%S) ==="
