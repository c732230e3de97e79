#!/bin/bash
# Round-4 chip phase: every TPU step strictly sequential (one python at a
# time — the axon worker dies if two processes claim it; see
# runs_grow_tsp100.log for two such crashes).  Run AFTER the labeling job
# completes.  Each step is independently re-runnable; stages cache.
set -x
cd /root/repo
LOG=runs_round4_chip.log
step() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

# 1. inference north star: sep paths vs incumbents (writes RESULTS_north_star)
step inference
timeout 1800 python -c "
import sys; sys.path.insert(0, 'benchmarks')
import json, pathlib, north_star
p = pathlib.Path('benchmarks/RESULTS_north_star.json')
r = json.loads(p.read_text())
r['inference'] = north_star.bench_inference()
p.write_text(json.dumps(r, indent=2)); north_star.write_md(r)
" 2>&1 | tail -12 | tee -a "$LOG"

# 2. GLS kernel v2: n=100 headline + n=500 probe (tpu_batch harness scales)
step gls_bench
timeout 1200 python bench.py 2>&1 | tail -3 | tee -a "$LOG"

# 2b. on-hardware full-size parity rows for the TPU inference paths
step parity_tpu
timeout 1800 python benchmarks/parity_full.py --impls sep,sep_fast,pallas,fast 2>&1 | tail -8 | tee -a "$LOG"

# 3. oracle refinement (rewrites test-split best-knowns in data/)
step refine_tsp100
timeout 2400 python benchmarks/refine_oracle.py --name tsp100 2>&1 | tail -6 | tee -a "$LOG"
step refine_tsp50
timeout 1800 python benchmarks/refine_oracle.py --name tsp50 2>&1 | tail -6 | tee -a "$LOG"

# 4. train tsp100_xl on the 10k set + eval both guides with paired stats
step train_tsp100_xl
timeout 7200 python benchmarks/grow_tsp100.py --extra 8000 --stage all 2>&1 | tail -25 | tee -a "$LOG"

# 4b. dataset-size curve: 2k vs 10k model on the refined split
step tsp100_curve
timeout 3600 python benchmarks/tsp100_curve.py 2>&1 | tail -15 | tee -a "$LOG"

# 5. tsp500 end-to-end (gen is the long pole; resumable)
step tsp500
timeout 7200 python benchmarks/tsp500_e2e.py 2>&1 | tail -20 | tee -a "$LOG"

# 6. wall-clock protocol cross-validation (subsample)
step protocol_crossval
timeout 2400 python benchmarks/protocol_crossval.py --name tsp100 --subsample 30 2>&1 | tail -8 | tee -a "$LOG"

step done
