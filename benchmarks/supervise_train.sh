#!/bin/bash
# Round-5 training supervisor: one epoch per process (CRASH_ENVELOPE bouts),
# auto-resume from the newest checkpoint, until checkpoint_final exists.
# Usage: bash benchmarks/supervise_train.sh [--fresh]
#   --fresh: clear the (possibly stale round-4 partial) train dir first.
cd /root/repo
LOG=runs_train_partial.log
TRAIN_DIR=runs/tsp100_xl/train
if [ "$1" = "--fresh" ]; then
  echo "=== fresh start: clearing $TRAIN_DIR $(date +%H:%M:%S)" | tee -a "$LOG"
  rm -rf "$TRAIN_DIR" runs/tsp100_xl/extra_labeled_partial.npz
fi
for attempt in $(seq 1 60); do
  if [ -f "$TRAIN_DIR/checkpoint_final.npz" ]; then
    echo "=== training complete (attempt $attempt) $(date +%H:%M:%S)" | tee -a "$LOG"
    exit 0
  fi
  echo "=== R5 T$attempt $(date +%H:%M:%S)" >> "$LOG"
  timeout 1800 python benchmarks/train_partial.py --stage train --epochs 28 >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 3 ]; then
    sleep 5
  else
    sleep 45
  fi
done
echo "=== train supervisor gave up $(date +%H:%M:%S)" | tee -a "$LOG"
exit 1
