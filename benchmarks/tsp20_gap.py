"""End-to-end tsp20 optimality-gap benchmark (reference protocol).

Reproduces the reference's full pipeline (README.md:53-63 scaled up) with
exact ground truth and self-trained weights:

  1. generate 3000 uniform tsp20 instances, EXACT optima via the native C++
     Held-Karp oracle (reference: Concorde, scripts/generate_instances.py:35);
  2. regret labels via the batched TPU GLS forced-edge oracle
     (reference: one LKH run per edge, gnngls/datasets.py:23-34; our oracle
     measures mean 7e-5 relative error vs exact forced-edge Held-Karp);
  3. split 2500/300/200 train/test/val in the reference's carve order
     (preprocess_dataset.py:29-31), MinMax scalers fit on train;
  4. train the regret GAT at reference defaults (train.py:74-86);
  5. evaluate mean optimality gap (test.py:104) of GLS guided by predicted
     regret vs weight-only GLS, on the Pallas fast engine.

Thin wrapper over gap_pipeline.Pipeline (stage caching under runs/tsp20/ is
layout-compatible with the original standalone script).  Results land in
benchmarks/RESULTS_tsp20.{md,json}; artifacts ship to models/tsp20 +
data/tsp20.
"""

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from benchmarks.gap_pipeline import Pipeline  # noqa: E402


def main():
    Pipeline(n=20, n_train=2500, n_test=300, n_val=200, label_iters=10,
             label_moves=30, budgets=(5, 100), name="tsp20").main()


if __name__ == "__main__":
    main()
