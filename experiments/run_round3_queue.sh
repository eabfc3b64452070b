#!/bin/bash
# Round-3 TPU experiment queue: run sequentially (ONE chip), each step
# bounded by timeout so a wedged kernel can't stall the queue.
# Usage: bash experiments/run_round3_queue.sh [start_step]
cd /root/repo
START=${1:-1}
LOG=/tmp/round3_queue.log
step() {
  N=$1; shift
  TMO=$1; shift
  if [ "$N" -lt "$START" ]; then echo "skip step $N"; return; fi
  echo "=== step $N: $* ($(date +%H:%M:%S)) ===" | tee -a $LOG
  timeout "$TMO" "$@" >> $LOG 2>&1
  echo "=== step $N exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
}

# Ordered so a LATE chip recovery still lands the headline results first:
# multirun scaling (VERDICT #1), then cheap items, then long accuracy runs.
# 1. multirun scaling f32 (the VERDICT #1 headline numbers)
step 1 3600 python experiments/multirun_scale.py 1 4 8 16
# 2. multirun scaling with bf16 MXU operands
step 2 3600 env FLSTTSC_WN_MXU=bf16 FLSTTSC_MULTIRUN_TAG=bf16 python experiments/multirun_scale.py 1 4 8 16
# 3. post-fix phase-5 breakdown (8MB default budget)
step 3 2400 python experiments/vmap_phase5_breakdown.py
# 4. vendored real-format dataset e2e (quick on TPU)
step 4 3600 python experiments/vendored_e2e.py
# 5. inv1x1 batched-slogdet frontier (quick)
step 5 2400 python experiments/inv1x1_frontier.py
# 6. config-4 at spec: 5 sources, 3 vote rules (also running CPU-side as fallback)
step 6 7200 python experiments/multisource_demo.py
# 7. efficacy curve: 3 pairs x 2 scarcity
step 7 10800 python experiments/efficacy_curve.py
# 8. bucketed archive sweep
step 8 7200 python experiments/bucketed_sweep_bench.py
echo "QUEUE DONE $(date)" | tee -a $LOG
