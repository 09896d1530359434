#!/bin/bash
# Round-5 chain I: mixed@16384 retry #5 on the cluster-limited cleanup
# (chain H proved all 6 Newton steps COMPLETE; the OOM moved to the
# final full-width (16384,16384) f64 Jacobi — now replaced by per-
# cluster projected rotations, O(n*m) temps).
# Usage: nohup bash scripts/exp/r5_chain_i.sh > /tmp/r5i_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1
export EK_MEM_DEBUG=1

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

step mixed16k_v5 10800 python scripts/exp/exp19_refine16k.py

echo "=== CHAIN R5I ALL DONE $(date +%H:%M:%S) ==="
