#!/bin/bash
# Round-5 chain C: waits for chain B, then (1) retries the mixed
# refinement at 16384 on the OOM-fixed code (commit 8485873) and
# (2) probes dynamic pltpu.roll lowering for the pre-sheared chase
# layout.  Same hardening as r5_chain.sh.
# Usage: nohup bash scripts/exp/r5_chain_c.sh > /tmp/r5c_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1

if [ -f /tmp/r5b.pid ]; then
  while kill -0 "$(cat /tmp/r5b.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "=== chain B finished; starting C $(date +%H:%M:%S) ==="

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

# 1. cheap probe first (risky compiles last does not apply: exp35 is a
#    tiny kernel, exp19 is the big compile — but exp19 is the round's
#    #2 deliverable, so run it before anything that could wedge the
#    worker; exp35's kernels are small enough to be safe either way)
step dynroll 1800 python scripts/exp/exp35_dynroll_probe.py

# 2. the r5 verdict-#2 deliverable: mixed <=1e-12 at 16384 on hardware
#    (OOM-fixed refine_stepwise; solver=scalapack matches exp19's cache)
step mixed16k 7200 python scripts/exp/exp19_refine16k.py

echo "=== CHAIN R5C ALL DONE $(date +%H:%M:%S) ==="
