"""Probe: warm-oracle compile + steady-state rate under the persistent
JAX compilation cache (round-5 label-throughput triage).

Usage: python benchmarks/probe_label_rate.py [--batched] [--n-inst 10]
Set JAX_COMPILATION_CACHE_DIR to test cross-process compile caching.
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
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("--n-inst", type=int, default=10)
    ap.add_argument("--inst-chunk", type=int, default=4)
    args = ap.parse_args()

    t_imp = time.time()
    from gnngls_tpu.core.graph import build_topology
    from gnngls_tpu.data import generate, solvers

    data = generate.load_dataset(ROOT / "runs" / "tsp100_xl" / "gen_shards" /
                                 "gen_00000000.npz")
    coords = data["coords"][: args.n_inst]
    tours = np.asarray(data["opt_tour"][: args.n_inst], np.int32)
    n = coords.shape[1]
    topo = build_topology(n)
    Ds = generate.coords_to_distance_matrix(coords).astype(np.float64)
    print(f"setup {time.time()-t_imp:.1f}s", flush=True)

    t0 = time.time()
    if args.batched:
        c, u, t = solvers.warm_fixed_edge_costs_batch(
            Ds[: args.inst_chunk], topo.edges, tours[: args.inst_chunk],
            n_gls_iters=0, perturbation_moves=20, dual_splice=True,
            inst_chunk=args.inst_chunk)
    else:
        c, u, t = solvers.warm_fixed_edge_costs(
            Ds[0], topo.edges, tours[0], n_gls_iters=0,
            perturbation_moves=20, dual_splice=True, edge_chunk=8192)
    warm = time.time() - t0
    print(f"first call (compile+run): {warm:.1f}s", flush=True)

    t0 = time.time()
    done = args.inst_chunk if args.batched else 1
    while done < args.n_inst:
        if args.batched:
            k = min(args.inst_chunk, args.n_inst - done)
            solvers.warm_fixed_edge_costs_batch(
                Ds[done:done + k], topo.edges, tours[done:done + k],
                n_gls_iters=0, perturbation_moves=20, dual_splice=True,
                inst_chunk=args.inst_chunk)
            done += k
        else:
            solvers.warm_fixed_edge_costs(
                Ds[done], topo.edges, tours[done], n_gls_iters=0,
                perturbation_moves=20, dual_splice=True, edge_chunk=8192)
            done += 1
    dt = time.time() - t0
    n_steady = done - (args.inst_chunk if args.batched else 1)
    if n_steady:
        print(f"steady: {dt/n_steady:.2f}s/inst over {n_steady}", flush=True)


if __name__ == "__main__":
    main()
