"""A/B harness for the whole-GLS Pallas kernel tuning knobs (round 5).

Run one mode per process (the knobs are read at import time and jit caches
would otherwise serve stale executables):

    GLS_DOT=asym GLS_ROLL=pltpu python benchmarks/gls_tune.py [--B 1024]

Prints moves/s plus a cross-mode correctness check: with a FIXED seed the
best costs and move counts must be identical across modes (the knobs are
exact-numerics transforms), verified against a reference file written by the
first mode to run (--check writes/compares runs/gls_tune_ref.npz).
"""

import argparse
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnngls_tpu.search import batched, pallas_gls

    mode = f"dot={pallas_gls._DOT_MODE} roll={pallas_gls._ROLL_MODE}"

    def make(seed):
        rng = np.random.default_rng(seed)
        pos = rng.random((args.B, args.n, 2))
        Ds = jnp.asarray(np.linalg.norm(
            pos[:, :, None] - pos[:, None, :], axis=-1).astype(np.float32))
        inits = batched.nearest_neighbor_batch(Ds)
        jax.block_until_ready((Ds, inits))
        return Ds, inits

    if args.check:
        Ds, inits = make(123)
        t, c, m, _, _ = pallas_gls.gls_pallas(
            Ds, Ds, inits, n_iters=args.iters, perturbation_moves=20)
        c, m = np.asarray(c), np.asarray(m)
        ref = ROOT / "runs" / "gls_tune_ref.npz"
        if ref.exists():
            z = np.load(ref)
            dc = np.abs(z["c"] - c).max()
            dm = np.abs(z["m"] - m).max()
            print(f"[{mode}] check vs ref: max|dcost|={dc:.3e} "
                  f"max|dmoves|={dm:.0f}")
        else:
            ref.parent.mkdir(exist_ok=True)
            np.savez(ref, c=c, m=m)
            print(f"[{mode}] check reference written")

    sets = [make(None) for _ in range(args.chunks + 1)]
    mv = pallas_gls.gls_pallas(sets[0][0], sets[0][0], sets[0][1],
                               n_iters=args.iters, perturbation_moves=20)[2]
    _ = np.asarray(mv)

    moves, dt = 0.0, 0.0
    for Ds, inits in sets[1:]:
        t0 = time.perf_counter()
        mv = pallas_gls.gls_pallas(Ds, Ds, inits, n_iters=args.iters,
                                   perturbation_moves=20)[2]
        moves += float(np.asarray(mv).sum())
        dt += time.perf_counter() - t0
    print(f"[{mode}] B={args.B} n={args.n} iters={args.iters}: "
          f"{moves / dt:.0f} moves/s")


if __name__ == "__main__":
    main()
