#!/bin/bash
# Round-5 TPU queue, stage 2: waits for run_round5_queue.sh to release the
# chip, then (a) diagnoses the dead SrcB ensemble member (VERDICT r4 weak
# #6) and (b) sanity-runs bench.py against the pinned denominator so the
# driver's end-of-round BENCH_r05 capture has a warmed, validated path.
cd /root/repo
LOG=/tmp/round5_queue2.log
PID=$(cat /tmp/round5_queue.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "=== queue1 done, stage 2 start $(date +%H:%M:%S) ===" | tee -a $LOG
timeout 1800 python experiments/srcb_diagnosis.py >> $LOG 2>&1
echo "=== srcb_diagnosis exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
BENCH_SKIP_REFERENCE=1 timeout 1800 python bench.py >> $LOG 2>&1
echo "=== bench sanity exit $? ($(date +%H:%M:%S)) ===" | tee -a $LOG
echo "ROUND5 QUEUE2 DONE $(date)" | tee -a $LOG
