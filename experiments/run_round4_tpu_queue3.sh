#!/bin/bash
# Round-4 TPU queue, part 3: waits for part 2 (PID in /tmp/tpu_queue2.pid),
# then measures the round-4 stacked-cotangent pullback knob end-to-end.
# Usage: bash experiments/run_round4_tpu_queue3.sh [start_step]
cd /root/repo
START=${1:-1}
LOG=/tmp/round4_tpu_queue3.log
if [ -f /tmp/tpu_queue2.pid ]; then
  P=$(cat /tmp/tpu_queue2.pid)
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

# 1. stacked_pullbacks end-to-end: aggregate phase-5 throughput at K=1/8/16
#    (flow-level microbench said 1.66x at K=1, ~1x at K=8 —
#    results_pullback_batched_cotangent.json; this decides the knob's fate)
step 1 3600 env FLSTTSC_FAST_PULLBACKS=stacked FLSTTSC_MULTIRUN_TAG=stacked \
  python experiments/multirun_scale.py 1 8 16
# 2. fresh default-path sweep at the same commit (fair A/B denominator;
#    picks up the round-4 default flip xonly_pullbacks=True)
step 2 3600 env FLSTTSC_MULTIRUN_TAG=default_r4 \
  python experiments/multirun_scale.py 1 8 16
# 3. stacked ON TOP of xonly (rows batched through the xonly pullback)
step 3 3600 env FLSTTSC_FAST_PULLBACKS=xonly,stacked FLSTTSC_MULTIRUN_TAG=xonly_stacked \
  python experiments/multirun_scale.py 1 8 16
# 4. full-curriculum sanity at the new default: 8 vmapped seeds, final accs
#    must land in the recorded band (tagged file, does not touch the
#    committed parity evidence)
step 4 7200 env FLSTTSC_PARITY_TAG=r4_default \
  python experiments/parity_fullscale.py ours_vmap 0 1 2 3 4 5 6 7
echo "TPU QUEUE3 DONE $(date)" | tee -a $LOG
