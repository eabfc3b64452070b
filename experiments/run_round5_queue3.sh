#!/bin/bash
# Round-5 TPU queue, stage 3: after stage 2 (SrcB diagnosis + bench sanity)
# releases the chip, run a right-sized `mixed` bucketing arm.  The full
# 112-dataset mixed arm was killed mid-run: in the sub-T=356 regime every
# distinct T//4 is a distinct architecture by the reference's own builder
# rule, so new-bucket compiles (~60-90 s each) dominate and the arm could
# not finish inside its window — 32 datasets measure the same
# bucket-count-vs-dataset-count slope at a fraction of the wall.
cd /root/repo
LOG=/tmp/round5_queue3.log
PID=$(cat /tmp/round5_queue2.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "=== stage 3 start $(date +%H:%M:%S) ===" | tee -a $LOG
timeout 1800 python experiments/bucketed_sweep.py mixed --datasets 32 >> $LOG 2>&1
echo "=== mixed32 exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
python experiments/positive_control.py summary >> $LOG 2>&1
echo "ROUND5 QUEUE3 DONE $(date)" | tee -a $LOG
