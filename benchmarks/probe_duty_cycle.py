"""Probe: does duty-cycling dispatches past the ~4-5 min crash horizon?

Runs the per-instance warm oracle continuously but sleeps `idle_s` every
`work_n` instances.  If the worker survives well past the horizon, the
crash trigger is sustained dispatch without idle gaps and the production
labeler adopts the duty cycle.

Usage: python benchmarks/probe_duty_cycle.py [--total 250] [--work-n 45]
       [--idle-s 15]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total", type=int, default=250)
    ap.add_argument("--work-n", type=int, default=45)
    ap.add_argument("--idle-s", type=float, default=15.0)
    args = ap.parse_args()

    from gnngls_tpu.core.graph import build_topology
    from gnngls_tpu.data import generate, solvers

    data = generate.load_dataset(ROOT / "runs" / "tsp100_xl" / "gen_shards" /
                                 "gen_00000000.npz")
    coords = data["coords"][: args.total]
    tours = np.asarray(data["opt_tour"][: args.total], np.int32)
    n = coords.shape[1]
    topo = build_topology(n)
    Ds = generate.coords_to_distance_matrix(coords).astype(np.float64)

    t_start = time.time()
    for i in range(args.total):
        solvers.warm_fixed_edge_costs(
            Ds[i], topo.edges, tours[i], n_gls_iters=0,
            perturbation_moves=20, dual_splice=True, edge_chunk=8192)
        if (i + 1) % args.work_n == 0:
            el = time.time() - t_start
            print(f"{i+1}/{args.total} at {el:.0f}s "
                  f"({el/(i+1):.2f}s/inst incl compile) — idling "
                  f"{args.idle_s}s", flush=True)
            time.sleep(args.idle_s)
    print(f"SURVIVED {args.total} instances in {time.time()-t_start:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
