#!/bin/bash
# Round-4 TPU queue, part 2: waits for part 1 (PID in /tmp/tpu_queue.pid)
# to drain the chip, then runs the items added mid-round.
# Usage: bash experiments/run_round4_tpu_queue2.sh [start_step]
cd /root/repo
START=${1:-1}
LOG=/tmp/round4_tpu_queue2.log
if [ -f /tmp/tpu_queue.pid ]; then
  P=$(cat /tmp/tpu_queue.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
step() {
  N=$1; shift
  TMO=$1; shift
  if [ "$N" -lt "$START" ]; then echo "skip step $N"; return; fi
  echo "=== step $N: $* ($(date +%H:%M:%S)) ===" | tee -a $LOG
  timeout "$TMO" "$@" >> $LOG 2>&1
  echo "=== step $N exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
}

# 1. Multivariate vendored-archive e2e (VERDICT r3 item 7)
step 1 3600 python experiments/vendored_e2e.py --multivariate
echo "TPU QUEUE2 DONE $(date)" | tee -a $LOG
