#!/bin/bash
# Round-5 chain G: the band-width ladder at the 16384 scale point.
# The chase plateau decomposition (SWEEP_r5.md: IO 1.34 / shear 1.6 /
# algebra 1.4 s at bw=32) leaves bw as the one unmeasured knob: chase
# VPU work scales ~n^2*bw (bw=16 halves algebra+shear flops) while the
# hop count doubles (per-step overhead doubles) and to_band gets
# cheaper per panel but needs more trailing updates.  Net direction is
# unknown — measure it.  bw=64 probes the other direction (fewer,
# fatter hops; chase VMEM may not fit — an error row is informative).
# Usage: nohup bash scripts/exp/r5_chain_g.sh > /tmp/r5g_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1

if [ -f /tmp/r5f.pid ]; then
  while kill -0 "$(cat /tmp/r5f.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "=== chain F finished; starting G $(date +%H:%M:%S) ==="

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

N=16384 BW=16 step bw16_16k 5400 python scripts/exp/exp24_stage_breakdown.py
N=16384 BW=64 step bw64_16k 5400 python scripts/exp/exp24_stage_breakdown.py

echo "=== CHAIN R5G ALL DONE $(date +%H:%M:%S) ==="
