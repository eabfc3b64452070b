#!/bin/bash
# Round-4 TPU experiment queue (ONE chip, sequential, each step bounded by
# timeout).  Starts with a chip-recovery watcher: the axon endpoint was
# unresponsive at round-4 restart (devices() lists, compute hangs — the
# round-3 outage mode), so poll a tiny compute until it succeeds, then run.
# Ordered so a LATE recovery still lands the highest-leverage results first
# (VERDICT r3 "Next round" items 1, 2, 3).
# Usage: bash experiments/run_round4_tpu_queue.sh [start_step]
cd /root/repo
START=${1:-1}
LOG=/tmp/round4_tpu_queue.log

echo "=== chip watcher start $(date +%H:%M:%S) ===" | tee -a $LOG
until timeout 120 python -u -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((128,128)).sum()))" >> $LOG 2>&1; do
  echo "chip still unresponsive $(date +%H:%M:%S)" >> $LOG
  sleep 120
done
echo "=== chip OK $(date +%H:%M:%S) ===" | tee -a $LOG

step() {
  N=$1; shift
  TMO=$1; shift
  if [ "$N" -lt "$START" ]; then echo "skip step $N"; return; fi
  echo "=== step $N: $* ($(date +%H:%M:%S)) ===" | tee -a $LOG
  timeout "$TMO" "$@" >> $LOG 2>&1
  echo "=== step $N exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
}

# 1. Positive control, style arm (VERDICT item 1 — the headline question)
step 1 7200 python experiments/positive_control.py style
# 2. Positive control, target-only arm
step 2 3600 python experiments/positive_control.py target_only
# 3. Fair control for the 5-source ensemble (VERDICT item 2)
step 3 7200 python experiments/multisource_demo.py target_only_ensemble
# 4. Batched-cotangent pullback microbench (VERDICT item 3)
step 4 2400 python experiments/pullback_batched_cotangent.py
# 5. xonly_pullbacks K=16 stability sweep (VERDICT item 3)
step 5 5400 python experiments/xonly_stability_sweep.py
echo "TPU QUEUE DONE $(date)" | tee -a $LOG
