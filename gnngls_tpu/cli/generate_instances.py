"""Generate a solved, regret-labeled dataset.

Reference: scripts/generate_instances.py (args :43-47; refuses an existing
output dir :49-52).  Output is one npz shard `instances.npz` in the directory
instead of per-instance gpickles; labels use the tiered oracle (Concorde/LKH
binaries if present, exact Held-Karp for small n, warm-start TPU forced-edge
solves otherwise).

Crash-resumability (reference parity: one pickle per instance as it goes,
scripts/generate_instances.py:57): generation and labeling write chunk shards
under <dir>/shards/; a killed run re-invoked with --resume skips completed
shards and loses at most one chunk.
"""

import argparse
import pathlib
import shutil


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate a dataset.")
    parser.add_argument("n_samples", type=int)
    parser.add_argument("n_nodes", type=int)
    parser.add_argument("dir", type=pathlib.Path)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--solver", type=str, default=None,
                        choices=[None, "held_karp", "gls", "concorde"])
    parser.add_argument("--label_method", type=str, default="auto",
                        choices=["auto", "held_karp", "gls", "lkh", "warm"])
    parser.add_argument("--opt_iters", type=int, default=100,
                        help="GLS budget for best-known tours (n > 22)")
    parser.add_argument("--chunk", type=int, default=250,
                        help="instances per resumable shard")
    parser.add_argument("--resume", action="store_true",
                        help="continue a killed run (dir may exist)")
    args = parser.parse_args(argv)

    if args.dir.exists() and not args.resume:
        raise SystemExit(f"Output directory {args.dir} exists "
                         f"(pass --resume to continue a killed run).")
    args.dir.mkdir(parents=True, exist_ok=True)
    shards = args.dir / "shards"

    from ..data import generate as gen, labels as lb

    data = gen.generate_instances_sharded(
        shards, args.n_samples, args.n_nodes, seed=args.seed,
        solver=args.solver, opt_iters=args.opt_iters, chunk=args.chunk)

    method = args.label_method
    if method in ("auto", "warm") and str(data["solver"]) != "held_karp" \
            and not _has_external():
        # heuristic best-known + warm labels: shard-resumable production path
        lb.warm_labels_chunked(data, shards, chunk=args.chunk, verbose=True)
    else:
        lb.compute_regret(data, method=method, verbose=True)
    gen.save_dataset(args.dir / "instances.npz", data)
    shutil.rmtree(shards, ignore_errors=True)
    print(f"wrote {args.n_samples} instances (n={args.n_nodes}, "
          f"solver={data['solver']}) to {args.dir / 'instances.npz'}")


def _has_external() -> bool:
    from ..data import solvers

    return solvers.has_lkh()


if __name__ == "__main__":
    main()
