#!/bin/bash
# Round-5 chain D: the retries with today's fixes in place —
# (1) chase-store repack A/B at 16384 (skipped in chain B by the
#     mid-run script edit),
# (2) mixed16k with the per-step barrier + no-copy _pad_place,
# (3) select32k on the restructured (single-store) tridiagonalize,
# (4) D&C secular-iteration A/B at 16k,
# (5) final bench_full (includes the mixed_m16384 extra row).
# Usage: nohup bash scripts/exp/r5_chain_d.sh > /tmp/r5d_chain.log 2>&1 &
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
  grep -vE "WARNING|sitecustomize" "/tmp/r5_step_${name}.out" | tail -40
  echo "=== $name rc=$rc END $(date +%H:%M:%S) ==="
  return $rc
}

N=16384 step repack16k 3600 python scripts/exp/exp34_repack_ab.py
step mixed16k_v2 7200 python scripts/exp/exp19_refine16k.py
step select32k_v2 10800 python scripts/exp/exp33_select32k.py
N=16384 ITERS=30,25,20 step dc16k 3600 python scripts/exp/exp20_dc_profile.py
step bench_final 10800 python bench.py

echo "=== CHAIN R5D ALL DONE $(date +%H:%M:%S) ==="
