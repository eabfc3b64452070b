#!/bin/bash
# Round-4 decisive CPU queue: the reference's OWN `train()` on the
# positive-control pair, plus the torch target-only control
# (VERDICT-r3 item 1 contingency).  Our style arm failed to lift over
# target-only on this shared-structure pair (results_positive_control.json,
# 0/4 cells), so the remaining question is method-vs-implementation: does
# the reference's torch pipeline lift on the same arrays?
#
# Scheduling note: parity pairs 4/5 (the n=8 queue) were killed to free
# this box's single core — at 38% CPU each they needed ~20 more core-hours
# and could not finish within the round (no mid-run checkpointing in the
# reference harness), while this queue decides the round's headline
# question in ~6-8 h.
# Usage: bash experiments/run_round4_poscontrol_queue.sh [start_step]
cd /root/repo
START=${1:-1}
LOG=/tmp/round4_poscontrol.log
step() {
  N=$1; shift
  TMO=$1; shift
  if [ "$N" -lt "$START" ]; then echo "skip step $N"; return; fi
  echo "=== step $N: $* ($(date +%H:%M:%S)) ===" | tee -a $LOG
  timeout "$TMO" "$@" >> $LOG 2>&1
  echo "=== step $N exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
}

# 1. Reference style-transfer train() on the scarcest cell (the headline).
step 1 30000 nice -n 5 python experiments/positive_control.py reference 16:0
# 2. Torch target-only control, both scarcity levels (fast, ~1 h).
step 2 12000 nice -n 5 python experiments/torch_target_only.py 16:0 32:0
# 3. Reference style-transfer on the n=32 cell (curve harvestable if cut).
step 3 30000 nice -n 5 python experiments/positive_control.py reference 32:0
echo "POSCONTROL QUEUE DONE $(date)" | tee -a $LOG
