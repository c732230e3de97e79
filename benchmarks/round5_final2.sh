#!/bin/bash
# Post-extended-training chain: re-ship + re-eval the equal-step xl model,
# regenerate the dataset-size curve, confirm the bench headline.
set -x
cd /root/repo
LOG=runs_round5_final.log
step() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

step eval_xl_28ep
timeout 3000 python benchmarks/train_partial.py --stage eval 2>&1 | tail -15 | tee -a "$LOG"

step curve_28ep
timeout 3600 python benchmarks/tsp100_curve.py 2>&1 | tail -25 | tee -a "$LOG"

step bench_final
timeout 1200 python bench.py 2>&1 | tail -2 | tee -a "$LOG"

step done2
