"""Quantify and shrink label-oracle error on test-split best-knowns.

VERDICT r3 item 5.  With Concorde/LKH absent, n>=50 "optima" are GLS
best-knowns; round-3 evals occasionally BEAT them (tsp50 protocol budget:
-0.0019%), biasing reported gaps low by an unquantified oracle error.  This
script hammers the TEST-split best-knowns with extra search until dry:

  each round = one batched large-budget GLS run per restart kind —
    * warm: init from the current best-known tour;
    * diverse: NN inits on noise-perturbed distance matrices (search always
      on the true D) — different entry basins;
  take the min across rounds; stop after `dry` consecutive rounds with no
  instance improving.  The improvement rate of the LAST wave before dry is
  the remaining-error indicator quoted in the results tables.

Writes the refined opt_tour/opt_cost/in_solution back into
data/<name>/instances.npz (test split only; a .bak of the original is kept
once) and records benchmarks/RESULTS_oracle_refinement.json.  Train-split
labels are untouched — stored test-split regret labels are not used by any
eval path (evaluation predicts regret with the model).

Usage: python benchmarks/refine_oracle.py --name tsp100 [--iters 400]
"""

import argparse
import json
import pathlib
import shutil
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def refine(name="tsp100", iters=400, pmoves=20, dry_rounds=2, max_rounds=8,
           noise=0.02, seed=0):
    import jax.numpy as jnp

    from gnngls_tpu.data import generate
    from gnngls_tpu.search import batched
    from gnngls_tpu.utils import tour_to_edge_vector

    ddir = ROOT / "data" / name
    path = ddir / "instances.npz"
    bak = ddir / "instances.npz.bak"
    if not bak.exists():
        shutil.copy2(path, bak)
    data = generate.load_dataset(path)
    n = int(data["n_nodes"])
    test_idx = np.loadtxt(ddir / "test.txt", dtype=int)

    Ds = generate.coords_to_distance_matrix(
        data["coords"][test_idx]).astype(np.float32)
    Dd = Ds.astype(np.float64)
    B = len(test_idx)
    best_tour = np.asarray(data["opt_tour"][test_idx], dtype=np.int32).copy()
    best = Dd[np.arange(B)[:, None], best_tour[:, :-1], best_tour[:, 1:]].sum(-1)
    start = best.copy()

    rng = np.random.default_rng(seed)
    rounds, dry, r = [], 0, 0
    while dry < dry_rounds and r < max_rounds:
        r += 1
        t0 = time.time()
        if r % 2 == 1:
            inits = best_tour  # warm restart from the incumbent
            kind = "warm"
        else:
            noised = Ds * (1.0 + noise * rng.random(Ds.shape).astype(np.float32))
            inits = np.asarray(batched.nearest_neighbor_batch(
                jnp.asarray(noised)))
            kind = f"diverse(noise={noise})"
        # whole-search Pallas engine: ~5x the XLA engine's moves/s AND its
        # n-scaled launch caps slice the batch into bounded launches with
        # host gaps between — the safe shape for the degraded worker
        # (CRASH_ENVELOPE.md); one run_fixed launch here would be a single
        # multi-minute fori_loop, the known-fatal shape
        res = batched.run_fixed_pallas(Ds, Ds[:, None], inits, n_iters=iters,
                                       perturbation_moves=pmoves)
        tours = np.asarray(res.best_tours, dtype=np.int32)
        costs = Dd[np.arange(B)[:, None], tours[:, :-1], tours[:, 1:]].sum(-1)
        improved = costs < best - 1e-9
        n_imp = int(improved.sum())
        rel = float(((best - costs)[improved] / best[improved]).mean() * 100
                    ) if n_imp else 0.0
        best_tour[improved] = tours[improved]
        best[improved] = costs[improved]
        rounds.append({"round": r, "kind": kind, "iters": iters,
                       "n_improved": n_imp, "mean_rel_improvement_pct": rel,
                       "wall_s": time.time() - t0})
        dry = dry + 1 if n_imp == 0 else 0
        print(f"[refine {name}] round {r} ({kind}): {n_imp}/{B} improved "
              f"({rel:.5f}% mean rel), {time.time()-t0:.0f}s", flush=True)

    total_rel = float(((start - best) / start).mean() * 100)
    n_total = int((best < start - 1e-9).sum())
    out = {
        "name": name, "n": n, "test_instances": B, "iters_per_round": iters,
        "rounds": rounds, "converged_dry": dry >= dry_rounds,
        "n_improved_total": n_total,
        "mean_rel_improvement_pct_over_split": total_rel,
        "statement": (
            f"{n_total}/{B} test best-knowns improved by refinement "
            f"(split-mean {total_rel:.5f}%); last wave found "
            f"{rounds[-1]['n_improved']} improvements — reported gaps carry "
            f"at most ~that residual oracle error."),
    }

    # write refined test-split rows back
    data["opt_tour"] = np.asarray(data["opt_tour"], dtype=np.int32)
    data["opt_cost"] = np.asarray(data["opt_cost"], dtype=np.float64)
    insol = np.asarray(data["in_solution"])
    data["opt_tour"][test_idx] = best_tour
    data["opt_cost"][test_idx] = best
    insol[test_idx] = np.stack([tour_to_edge_vector(n, t) for t in best_tour])
    data["in_solution"] = insol
    generate.save_dataset(path, data)

    rpath = ROOT / "benchmarks" / "RESULTS_oracle_refinement.json"
    existing = json.loads(rpath.read_text()) if rpath.exists() else {}
    existing[name] = out
    rpath.write_text(json.dumps(existing, indent=2))
    print(json.dumps(out["statement"], indent=2))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="tsp100")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--max-rounds", type=int, default=8)
    args = ap.parse_args(argv)
    refine(name=args.name, iters=args.iters, max_rounds=args.max_rounds)


if __name__ == "__main__":
    main()
