#!/bin/bash
# r4g: post-x64-fix hardware validation + BENCH_r04 showcase + refine16k
# stepwise retry + remaining sweep rows.  Serial — one TPU process at a
# time; every step bounded by timeout.
LOG=/tmp/r4g_chain.log
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" >> $LOG
  timeout ${TMO:-2400} env "$@" 2>&1 | grep -v -E "WARNING|^I0|^E0|axon_|Source Location" >> $LOG
  echo "=== $name rc=$? END $(date -u +%H:%M:%S) ===" >> $LOG
}
echo "=== R4G STARTING $(date -u +%H:%M:%S) ===" >> $LOG

# 1. the x64 fix on hardware: eigensx mixed at 2048 (was RecursionError)
TMO=2400 run eigensx_mixed2048_fix python scripts/exp/exp32_eigensx_mixed_tpu.py

# 2. BENCH_r04 showcase: headline + mixed + gen + full 16k row (the 16k
#    row died on the x64 RecursionError in r4e) + honest stage times
TMO=7200 run bench_full EK_BENCH_LOG=/root/repo/evidence/log_bench_r4g.json python bench.py

# 3. refine16k with the stepwise donated-buffer driver (was a 74 GB
#    whole-refinement jit plan)
TMO=6000 run refine16k_stepwise N=16384 python scripts/exp/exp19_refine16k.py

# 4. mixed sweep re-run (eigensx row now fixed)
TMO=3000 run sweep_mixed2048d python scripts/sweep.py --n 2048 --dtype mixed --budget-s 2400

# 5. selecting-solver sweep rows (std + gen, lowest-500 at 4096)
TMO=2400 run sweep_sel4096 python scripts/sweep.py --n 4096 --select-k 500 --solvers scalapack_select
TMO=2400 run sweep_selgen4096 python scripts/sweep.py --n 4096 --generalized --select-k 500 --solvers general_scalapack_select

echo "=== CHAIN R4G ALL DONE $(date -u +%H:%M:%S) ===" >> $LOG
