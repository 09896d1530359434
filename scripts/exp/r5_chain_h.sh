#!/bin/bash
# Round-5 chain H: (1) mixed@16384 retry #4 with the schedule-equalized
# column blocks — chain F proved step 0 (md=5) RUNS and step 1 (md=9)
# OOMs, so per-step memory is now held constant by shrinking nc as md
# grows; (2) the band-width ladder (from the cancelled chain G).
# Usage: nohup bash scripts/exp/r5_chain_h.sh > /tmp/r5h_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1
export EK_MEM_DEBUG=1

if [ -f /tmp/r5f.pid ]; then
  while kill -0 "$(cat /tmp/r5f.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "=== chain F finished; starting H $(date +%H:%M:%S) ==="

probe() {
  for i in $(seq 1 30); do
    timeout 900 python - >/dev/null 2>&1 <<'PYEOF' && return 0
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
x = jnp.ones((256, 256))
assert float(jnp.sum(x @ x)) == 16777216.0
PYEOF
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
  grep -vE "WARNING|sitecustomize" "/tmp/r5_step_${name}.out" | tail -40
  echo "=== $name rc=$rc END $(date +%H:%M:%S) ==="
  return $rc
}

step mixed16k_v4 7200 python scripts/exp/exp19_refine16k.py

N=16384 BW=16 step bw16_16k 5400 python scripts/exp/exp24_stage_breakdown.py
N=16384 BW=64 step bw64_16k 5400 python scripts/exp/exp24_stage_breakdown.py

echo "=== CHAIN R5H ALL DONE $(date +%H:%M:%S) ==="
