#!/bin/bash
# Round-5 chain J: selecting-32k retry #4 on the donated + row-blocked
# tridiagonalize (commit 5fb8702): the jit no longer copies the 4 GB
# input into its loop carry, and the rank-2b trailing update's (m,m)
# GEMM temp is row-blocked.  Modeled peak ~ vstore 4 + carry 4 +
# chunk temps 0.5 + recursion-slice transient ~3 = ~11.5 GB of 15.75.
# Usage: nohup bash scripts/exp/r5_chain_j.sh > /tmp/r5j_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1
export EK_MEM_DEBUG=1

if [ -f /tmp/r5i.pid ]; then
  while kill -0 "$(cat /tmp/r5i.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "=== chain I finished; starting J $(date +%H:%M:%S) ==="

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

step select32k_v4 10800 python scripts/exp/exp33_select32k.py

echo "=== CHAIN R5J ALL DONE $(date +%H:%M:%S) ==="
