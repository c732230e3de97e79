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
     regret vs weight-only GLS, across fixed iteration budgets, on the
     Pallas fast engine.

Every stage caches its artifacts under runs/tsp20/ and is resumable.
Results land in benchmarks/RESULTS_tsp20.md (+ .json); the trained
checkpoint + scalers are copied to models/tsp20/ (mirroring the reference's
shipped-models layout).
"""

import json
import pathlib
import shutil
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))
RUN = ROOT / "runs" / "tsp20"

N_TOTAL, N_TRAIN, N_TEST, N_VAL = 3000, 2500, 300, 200
N_NODES = 20
LABEL_CHUNK = 250


def stage_generate():
    from gnngls_tpu.data import generate

    path = RUN / "dataset.npz"
    if path.exists():
        print("[generate] cached")
        return generate.load_dataset(path)
    t0 = time.time()
    data = generate.generate_instances(N_TOTAL, N_NODES, seed=0,
                                       solver="held_karp")
    generate.save_dataset(path, data)
    print(f"[generate] {N_TOTAL} exact instances in {time.time()-t0:.0f}s")
    return data


def stage_labels(data):
    from gnngls_tpu.core.graph import build_topology
    from gnngls_tpu.data import generate, solvers

    path = RUN / "dataset_labeled.npz"
    if path.exists():
        print("[labels] cached")
        return generate.load_dataset(path)

    topo = build_topology(N_NODES)
    E = topo.n_edges
    Ds = generate.coords_to_distance_matrix(data["coords"]).astype(np.float64)
    opt = np.asarray(data["opt_cost"], dtype=np.float64)
    in_sol = np.asarray(data["in_solution"], dtype=bool)

    regret = np.zeros((N_TOTAL, E), dtype=np.float32)
    done = 0
    for s in range(0, N_TOTAL, LABEL_CHUNK):
        part = RUN / f"labels_{s}.npy"
        e = min(s + LABEL_CHUNK, N_TOTAL)
        if part.exists():
            regret[s:e] = np.load(part)
            done = e
            continue
        t0 = time.time()
        for i in range(s, e):
            costs, _ = solvers.gls_fixed_edge_costs(
                Ds[i], topo.edges, n_iters=10, perturbation_moves=30)
            r = (costs - opt[i]) / opt[i]
            r[in_sol[i]] = 0.0
            regret[i] = np.maximum(r, 0.0)
        np.save(part, regret[s:e])
        done = e
        print(f"[labels] {done}/{N_TOTAL} ({(time.time()-t0)/(e-s):.2f}s/inst)")

    data["regret"] = regret
    generate.save_dataset(path, data)
    for s in range(0, N_TOTAL, LABEL_CHUNK):
        (RUN / f"labels_{s}.npy").unlink(missing_ok=True)
    return data


def make_splits(data):
    from gnngls_tpu.data.dataset import TSPDataset

    # reference carve order: train, then test, then val (preprocess:29-31)
    tr = np.arange(0, N_TRAIN)
    te = np.arange(N_TRAIN, N_TRAIN + N_TEST)
    va = np.arange(N_TRAIN + N_TEST, N_TRAIN + N_TEST + N_VAL)
    train_set = TSPDataset.from_arrays(data, tr)
    scalers = train_set.fit_scalers()
    test_set = TSPDataset.from_arrays(data, te, scalers=scalers)
    val_set = TSPDataset.from_arrays(data, va, scalers=scalers)
    return train_set, val_set, test_set


def stage_train(train_set, val_set):
    import jax

    from gnngls_tpu.models import regret_gat as M
    from gnngls_tpu.train import checkpoint as ckpt
    from gnngls_tpu.train.loop import TrainConfig, train_model

    run_dir = RUN / "train"
    best = run_dir / "checkpoint_best_val.npz"
    final = run_dir / "checkpoint_final.npz"

    def load_best():
        tmpl_p, tmpl_b = M.init_params(jax.random.PRNGKey(0),
                                       M.RegretGNNConfig(in_dim=train_set.feat_dim))
        params, bn_state, _, _ = ckpt.load_checkpoint(
            best if best.exists() else final,
            params_like=tmpl_p, bn_state_like=tmpl_b)
        return params, bn_state

    if final.exists():
        print("[train] cached")
        return load_best()
    cfg = TrainConfig(n_epochs=100, val_on_train=False)
    t0 = time.time()
    _, _, history = train_model(train_set, val_set, cfg, run_dir)
    print(f"[train] {len(history)} epochs in {time.time()-t0:.0f}s, "
          f"final val {history[-1]['val_loss']:.6f}")
    return load_best()


def stage_eval(test_set, params, bn_state):
    from gnngls_tpu.evaluate import evaluate
    from gnngls_tpu.models import regret_gat as M

    cfg = M.RegretGNNConfig(in_dim=test_set.feat_dim)
    results = {}
    # each (n_iters, guide) pair is a fresh Mosaic compile through the remote
    # tunnel (~minutes) — keep the budget grid small
    for n_iters in (5, 100):
        for label, kw in (
            ("regret_pred", dict(params=params, bn_state=bn_state,
                                 model_cfg=cfg, guides=["regret_pred"])),
            ("weight", dict(guides=["weight"])),
        ):
            t0 = time.time()
            out = evaluate(test_set, time_limit=None, n_iters=n_iters,
                           perturbation_moves=20, **kw)
            dt = time.time() - t0
            init_gap = float((out["init_costs"] / out["opt_costs"] - 1).mean() * 100)
            results[f"{label}@{n_iters}"] = {
                "guide": label, "n_iters": n_iters,
                "mean_gap_pct": out["mean_gap"],
                "p95_gap_pct": float(np.percentile(out["gaps"], 95)),
                "frac_optimal": float((out["gaps"] < 1e-4).mean()),
                "mean_init_gap_pct": init_gap,
                "batch_wall_s": dt,
                "wall_s_per_instance": dt / len(test_set),
            }
            print(f"[eval] {label}@{n_iters}: mean gap "
                  f"{out['mean_gap']:.4f}%  opt-rate "
                  f"{results[f'{label}@{n_iters}']['frac_optimal']:.3f}  "
                  f"({dt:.1f}s batch)")
    return results


def ship_model(test_set):
    from gnngls_tpu.core.scaler import save_scalers

    dst = ROOT / "models" / "tsp20"
    dst.mkdir(parents=True, exist_ok=True)
    for f in ("checkpoint_best_val.npz", "params.json"):
        src = RUN / "train" / f
        if src.exists():
            shutil.copy2(src, dst / f)
    save_scalers(dst / "scalers.json", test_set.scalers)
    # dataset + split files in the reference's data/<size>/ layout so the
    # CLI flow (cli/test.py data/tsp20/test.txt models/tsp20/... ) just works
    ddir = ROOT / "data" / "tsp20"
    ddir.mkdir(parents=True, exist_ok=True)
    shutil.copy2(RUN / "dataset_labeled.npz", ddir / "instances.npz")
    save_scalers(ddir / "scalers.json", test_set.scalers)
    np.savetxt(ddir / "train.txt", np.arange(0, N_TRAIN), fmt="%d")
    np.savetxt(ddir / "test.txt", np.arange(N_TRAIN, N_TRAIN + N_TEST), fmt="%d")
    np.savetxt(ddir / "val.txt",
               np.arange(N_TRAIN + N_TEST, N_TRAIN + N_TEST + N_VAL), fmt="%d")


def write_results(results):
    (ROOT / "benchmarks").mkdir(exist_ok=True)
    with open(ROOT / "benchmarks" / "RESULTS_tsp20.json", "w") as f:
        json.dump(results, f, indent=2)
    lines = [
        "# tsp20 optimality gap — self-trained model, exact optima",
        "",
        "3000 uniform instances; optima = exact Held-Karp (native C++).",
        "Regret labels = batched TPU GLS forced-edge oracle (7e-5 mean rel err",
        "vs exact).  Model = reference defaults (128/8 heads = depth, 1.19M",
        "params).  Eval = 300 held-out instances, Pallas GLS engine, 20",
        "perturbation moves/iter (test.py protocol); gap vs exact optimum.",
        "",
        "| guide | outer iters | mean gap % | p95 gap % | optimal rate | init gap % | s/instance |",
        "|---|---|---|---|---|---|---|",
    ]
    for k, r in results.items():
        lines.append(
            f"| {r['guide']} | {r['n_iters']} | {r['mean_gap_pct']:.4f} | "
            f"{r['p95_gap_pct']:.4f} | {r['frac_optimal']:.3f} | "
            f"{r['mean_init_gap_pct']:.2f} | {r['wall_s_per_instance']:.4f} |")
    lines.append("")
    lines.append("Reference protocol (10 s/instance, 1 CPU thread) reaches ~0% "
                 "gap at n=20; the table shows the gap/compute frontier on one "
                 "TPU chip — the whole 300-instance test set runs as one batch.")
    with open(ROOT / "benchmarks" / "RESULTS_tsp20.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    RUN.mkdir(parents=True, exist_ok=True)
    data = stage_generate()
    data = stage_labels(data)
    train_set, val_set, test_set = make_splits(data)
    params, bn_state = stage_train(train_set, val_set)
    results = stage_eval(test_set, params, bn_state)
    ship_model(test_set)
    write_results(results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
