#!/bin/bash
# Round-4 CPU queue: reference full-curriculum runs on NEW data pairs
# (VERDICT-r3 item 6: grow the paired-parity table toward n=8).
# Each run is ~5.7 h on this 1-core box; sequential, lowest priority so
# TPU-side work (tests, experiment drivers) is never starved.
# Usage: bash experiments/run_round4_ref_queue.sh [pair ...]
cd /root/repo
LOG=/tmp/round4_ref_queue.log
PAIRS=${@:-4 5 6 7}
for P in $PAIRS; do
  echo "=== reference pair $P start $(date +%H:%M:%S) ===" | tee -a $LOG
  nice -n 19 timeout 28800 python experiments/parity_fullscale.py reference "$P" >> $LOG 2>&1
  echo "=== reference pair $P exit $? $(date +%H:%M:%S) ===" | tee -a $LOG
done
echo "REF QUEUE DONE $(date)" | tee -a $LOG
