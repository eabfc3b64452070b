#!/bin/bash
# Round-5 CPU arm: torch target-only on the HARDENED positive-control cells
# (reference modules, CE+CPC, full 1,718-epoch budget) — the feasible torch
# half of the regime-boundary cross-implementation anchor.  nice -19 so the
# TPU queue's host side is never starved; incremental merges make a cut-off
# harvestable.
cd /root/repo
LOG=/tmp/round5_torch.log
echo "=== torch hardened cells start $(date +%H:%M:%S) ===" | tee -a $LOG
nice -n 19 timeout 10000 python experiments/torch_target_only.py 16:0:3.5 16:0:5 >> $LOG 2>&1
echo "=== torch hardened cells exit $? $(date +%H:%M:%S) ===" | tee -a $LOG
