#!/bin/bash
# Round-5 TPU queue (final round): VERDICT-r4 items 4 (regime-boundary
# transfer arms on the hardened positive-control pair) and 8 (archive-scale
# bucketed sweep).  Sequential — the single v5e chip admits one client.
#
# Scheduling note: VERDICT items 2/3 (reference n=8 parity pairs, reference
# style arm to 720/720) need ~6 h EACH on this 1-core box and cannot finish
# inside the final ~3 h round — documented as environment-bound in ROADMAP.
# The feasible torch-side arm (target-only on the hardened cells, ~25 min
# each) runs concurrently on CPU via run_round5_torch.sh.
# Usage: bash experiments/run_round5_queue.sh [start_step]
cd /root/repo
START=${1:-1}
LOG=/tmp/round5_queue.log
step() {
  N=$1; shift
  TMO=$1; shift
  if [ "$N" -lt "$START" ]; then echo "skip step $N"; return; fi
  echo "=== step $N: $* ($(date +%H:%M:%S)) ===" | tee -a $LOG
  timeout "$TMO" "$@" >> $LOG 2>&1
  echo "=== step $N exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
}

# 1. All four hardened style cells as ONE vmapped program (~15-25 min).
step 1 2700 python experiments/positive_control.py style_vmap 16:0:3.5 16:0:5 16:1:3.5 16:1:5
# 2. Seed-1 target-only arms at both hardened levels (~20 min).
step 2 1800 python experiments/positive_control.py target_only 16:1:3.5 16:1:5
# 3. Archive-scale bucketed sweep: 100 long + 112 mixed datasets.
step 3 4500 python experiments/bucketed_sweep.py all
# 4. Refresh the summary block.
step 4 300 python experiments/positive_control.py summary
echo "ROUND5 QUEUE DONE $(date)" | tee -a $LOG
