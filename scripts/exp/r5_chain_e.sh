#!/bin/bash
# Round-5 chain E: waits for chain D, then the chase align retry at 16k
# (the r3 "align loses at 16k" claim was never measured at G=34 — that
# compile died on the scoped ceiling, and the EK_PALLAS_CHASE_VMEM knob
# that raises it was passing MB as raw BYTES until commit <head>), plus
# the to_band split=16 ladder.
# Usage: nohup bash scripts/exp/r5_chain_e.sh > /tmp/r5e_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1

if [ -f /tmp/r5d.pid ]; then
  while kill -0 "$(cat /tmp/r5d.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "=== chain D finished; starting E $(date +%H:%M:%S) ==="

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

# 1. align x G=34 at 16k with a real scoped-VMEM ceiling (24 MB)
N=16384 GSIZES=34 IOS=align,lane EK_PALLAS_CHASE_VMEM=24 \
  step align16k 5400 python scripts/exp/exp18_chase_groups.py

# 2. to_band bucketing split ladder at 16k (min-over-3 protocol)
N=16384 SPLITS=8,16 step toband16k_splits 3600 python scripts/exp/exp30_toband_split.py

echo "=== CHAIN R5E ALL DONE $(date +%H:%M:%S) ==="
