#!/bin/bash
# Round-5 label-phase supervisor: re-launch the resumable grow_tsp100 data
# stage until the merged artifact exists.  The labeler duty-cycles its
# dispatches (45 work / 15 s idle, CRASH_ENVELOPE.md) which keeps the
# degraded worker alive indefinitely; this loop is the crash safety net
# (losses bounded by one 250-instance shard).
cd /root/repo
LOG=runs_grow_tsp100.log
DONE=runs/tsp100_xl/extra_labeled.npz
for attempt in $(seq 1 200); do
  if [ -f "$DONE" ]; then
    echo "=== labels complete (attempt $attempt) $(date +%H:%M:%S)" | tee -a "$LOG"
    exit 0
  fi
  # .chip_lock: another chip job (measurement phase) holds the TPU — wait
  while [ -f /root/repo/.chip_lock ]; do sleep 20; done
  echo "=== R5 L$attempt $(date +%H:%M:%S)" >> "$LOG"
  timeout 3600 python benchmarks/grow_tsp100.py --extra 8000 --stage data >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 3 ]; then
    sleep 5   # clean bout exit: relaunch quickly
  else
    sleep 45  # crash: let the stale TPU claim time out
  fi
done
echo "=== supervisor gave up $(date +%H:%M:%S)" | tee -a "$LOG"
exit 1
