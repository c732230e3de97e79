"""Generate a solved, regret-labeled dataset.

Reference: scripts/generate_instances.py (args :43-47; refuses an existing
output dir :49-52).  Output is one npz shard `instances.npz` in the directory
instead of per-instance gpickles; labels use the tiered oracle (Concorde/LKH
binaries if present, exact Held-Karp for small n, batched TPU GLS otherwise).
"""

import argparse
import pathlib


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate a dataset.")
    parser.add_argument("n_samples", type=int)
    parser.add_argument("n_nodes", type=int)
    parser.add_argument("dir", type=pathlib.Path)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--solver", type=str, default=None,
                        choices=[None, "held_karp", "gls", "concorde"])
    parser.add_argument("--label_method", type=str, default="auto",
                        choices=["auto", "held_karp", "gls", "lkh"])
    args = parser.parse_args(argv)

    if args.dir.exists():
        raise SystemExit(f"Output directory {args.dir} exists.")
    args.dir.mkdir(parents=True)

    from ..data import generate as gen, labels as lb

    data = gen.generate_instances(args.n_samples, args.n_nodes, seed=args.seed,
                                  solver=args.solver)
    lb.compute_regret(data, method=args.label_method, verbose=True)
    gen.save_dataset(args.dir / "instances.npz", data)
    print(f"wrote {args.n_samples} instances (n={args.n_nodes}, "
          f"solver={data['solver']}) to {args.dir / 'instances.npz'}")


if __name__ == "__main__":
    main()
