#!/bin/bash
# Round-5 chain F: memory-instrumented retries of the two chain-D
# runtime OOMs.  Both failures ran minutes after a genuine OOM crash
# (the shear-repack step), so "leaked/degraded worker" and "real OOM"
# are indistinguishable in the D logs.  Every step here prints
# allocator stats (bytes_in_use / peak / largest_free) at process
# start and per pipeline stage / refine step (EK_MEM_DEBUG=1), and the
# first step is a bare memory probe on a quiet worker.
# Usage: nohup bash scripts/exp/r5_chain_f.sh > /tmp/r5f_chain.log 2>&1 &
set -o pipefail
cd /root/repo
export PYTHONUNBUFFERED=1
export EK_MEM_DEBUG=1

if [ -f /tmp/r5e.pid ]; then
  while kill -0 "$(cat /tmp/r5e.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "=== chain E finished; starting F $(date +%H:%M:%S) ==="

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
  grep -vE "WARNING|sitecustomize" "/tmp/r5_step_${name}.out" | tail -60
  echo "=== $name rc=$rc END $(date +%H:%M:%S) ==="
  return $rc
}

# 0. bare allocator state on a quiet worker
step memprobe 900 python - <<'PYEOF'
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from eigenkernel_tpu.obs.mem import memstats
memstats("bare_process", force=True)
PYEOF

# 1. mixed refine at 16384 (chain-D failure #1), with the f32
#    eigenvector buffer now freed before the refine jits
step mixed16k_v3 7200 python scripts/exp/exp19_refine16k.py

# 2. selecting lowest-500 at 32768 (chain-D failure #2)
REPEATS=2 step select32k_v3 10800 python scripts/exp/exp33_select32k.py

echo "=== CHAIN R5F ALL DONE $(date +%H:%M:%S) ==="
