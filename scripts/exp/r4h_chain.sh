#!/bin/bash
# r4h: fires after r4g. to_band panel-carry A/B (the transposed (b,n)
# carry landed untimed), chase fuse ladder at 16k.
LOG=/tmp/r4h_chain.log
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" >> $LOG
  timeout ${TMO:-2400} env "$@" 2>&1 | grep -v -E "WARNING|^I0|^E0|axon_|Source Location|XLA label" >> $LOG
  echo "=== $name rc=$? END $(date -u +%H:%M:%S) ===" >> $LOG
}
while ! grep -q "CHAIN R4G ALL DONE" /tmp/r4g_chain.log 2>/dev/null; do
  if [ -f /tmp/r4g.pid ] && ! kill -0 $(cat /tmp/r4g.pid) 2>/dev/null; then
    echo "r4g gone without DONE; proceeding" >> $LOG
    break
  fi
  sleep 60
done
echo "=== R4H STARTING $(date -u +%H:%M:%S) ===" >> $LOG

# 1. to_band with the transposed panel carry (vs r4c: 1.755 s @16k/split8)
TMO=3600 run toband16k_carry N=16384 BW=32 SPLITS=8 python scripts/exp/exp30_toband_split.py
TMO=2400 run toband8k_carry N=8192 BW=32 SPLITS=8 python scripts/exp/exp30_toband_split.py

# 2. chase fuse ladder at 16k (per-step grid overhead amortization)
TMO=5400 run chase16k_fuse N=16384 BW=32 IOS=lane FUSES=4,8 BUDGET_S=4200 python scripts/exp/exp16_chase_profile.py

echo "=== CHAIN R4H ALL DONE $(date -u +%H:%M:%S) ===" >> $LOG
