#!/bin/bash
# Round-3 TPU queue, part 2: waits for the part-1 queue (PID in
# /tmp/queue.pid) to drain the chip, then runs the kernel-frontier and
# pullback-knob probes added mid-round.
# Usage: bash experiments/run_round3_queue2.sh [start_step]
cd /root/repo
START=${1:-1}
LOG=/tmp/round3_queue2.log
if [ -f /tmp/queue.pid ]; then
  P=$(cat /tmp/queue.pid)
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

# 1. xonly-pullbacks knob: production step + vmapped K=8
step 1 2400 python experiments/xonly_pullbacks_bench.py 1 8
# 2. WN kernel roofline attribution (ablations, f32 + bf16)
step 2 2400 python experiments/wn_roofline.py 1 8
# 3. inv1x1 batched-slogdet frontier (fixed data layout)
step 3 2400 python experiments/inv1x1_frontier.py
# 4. multirun K-sweep with both pullback knobs on (headline re-measure)
step 4 3600 env FLSTTSC_FAST_PULLBACKS=1 FLSTTSC_MULTIRUN_TAG=fastpulls python experiments/multirun_scale.py 1 4 8 16
# 5. paired full-length parity: 2 fresh inits on each of the 4 reference
#    data pairs, vmapped K=8 through the chip-filling path (Weak #1: puts
#    an ours-side distribution on the SAME pairs the reference seeds ran)
step 5 14400 python experiments/parity_fullscale.py ours_vmap 0:10 0:11 1:10 1:11 2:10 2:11 3:10 3:11
echo "QUEUE2 DONE $(date)" | tee -a $LOG
