#!/bin/bash
# Post-training evidence chain (run when checkpoint_final exists).
set -x
cd /root/repo
LOG=runs_round5_final.log
step() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

step eval_xl
timeout 3000 python benchmarks/train_partial.py --stage eval 2>&1 | tail -20 | tee -a "$LOG"

step curve
timeout 3600 python benchmarks/tsp100_curve.py 2>&1 | tail -25 | tee -a "$LOG"

step crossval
timeout 2400 python benchmarks/protocol_crossval.py --name tsp100 --subsample 30 2>&1 | tail -10 | tee -a "$LOG"

step bench
timeout 1200 python bench.py 2>&1 | tail -2 | tee -a "$LOG"

step done
