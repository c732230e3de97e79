"""Gap vs training-set size: the 2k-instance vs 10k-instance tsp100 models
evaluated head-to-head on the SAME (refined-best-known) test split.

VERDICT r3 item 3's deliverable: whether the regret-guide margin widens as
the dataset grows toward the reference's 100k regime
(/root/reference/scripts/preprocess_dataset.py:17-19).  Both models are
evaluated at identical budgets with paired statistics; weight-guided rows
are model-free controls (identical between models up to engine noise).

Usage: python benchmarks/tsp100_curve.py  (after grow_tsp100 --stage all)
Appends the curve section to benchmarks/RESULTS_tsp100.md and writes
RESULTS_tsp100_curve.json.
"""

import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

N_TRAIN0, N_TEST, N_VAL = 2000, 500, 200


def load_model(mdir, feat_dim=1):
    import jax

    from gnngls_tpu.models import regret_gat as M
    from gnngls_tpu.train import checkpoint as ckpt

    cfg = M.RegretGNNConfig(in_dim=feat_dim)
    tp, tb = M.init_params(jax.random.PRNGKey(0), cfg)
    params, bn, _, _ = ckpt.load_checkpoint(
        mdir / "checkpoint_best_val.npz", params_like=tp, bn_state_like=tb)
    return cfg, params, bn


def main():
    from gnngls_tpu import evaluate as ev, stats
    from gnngls_tpu.core.scaler import load_scalers
    from gnngls_tpu.data import generate
    from gnngls_tpu.data.dataset import TSPDataset

    data = generate.load_dataset(ROOT / "data" / "tsp100" / "instances.npz")
    te = np.arange(N_TRAIN0, N_TRAIN0 + N_TEST)

    def xl_train_size():
        for f in ("extra_labeled.npz", "extra_labeled_partial.npz"):
            q = ROOT / "runs" / "tsp100_xl" / f
            if q.exists():
                with np.load(q) as z:
                    return N_TRAIN0 + int(z["coords"].shape[0])
        return N_TRAIN0

    models = {}
    for name, train_size in (("tsp100", 2000), ("tsp100_xl", xl_train_size())):
        mdir = ROOT / "models" / name
        if not (mdir / "checkpoint_best_val.npz").exists():
            print(f"[curve] skipping {name} (no checkpoint)")
            continue
        models[name] = (train_size, mdir)

    # protocol budget: calibrate once (weight guide) on the shared split
    probe_set = TSPDataset.from_arrays(
        data, te, scalers=load_scalers(ROOT / "data" / "tsp100" /
                                       "scalers.json"))
    target = ev.REFERENCE_10S_MOVES[100]
    b10 = ev.calibrate_protocol_iters(probe_set, target_moves=target,
                                     guides=["weight"])
    budgets = sorted({5, int(b10), 100})
    print(f"[curve] budgets: {budgets} (protocol={b10})", flush=True)

    results = {"budgets": budgets, "protocol_budget": b10, "rows": {},
               "paired": {}}
    gaps_store = {}
    for name, (train_size, mdir) in models.items():
        # each model was trained with ITS OWN scalers
        scalers = load_scalers(mdir / "scalers.json")
        test_set = TSPDataset.from_arrays(data, te, scalers=scalers)
        cfg, params, bn = load_model(mdir, test_set.feat_dim)
        for b in budgets:
            out = ev.evaluate(test_set, params=params, bn_state=bn,
                              model_cfg=cfg, guides=["regret_pred"],
                              time_limit=None, n_iters=b)
            key = f"{name}@{b}"
            gaps_store[key] = np.asarray(out["gaps"])
            results["rows"][key] = {
                "model": name, "train_size": train_size, "n_iters": int(b),
                "mean_gap_pct": float(out["mean_gap"]),
                "p95_gap_pct": float(np.percentile(out["gaps"], 95)),
                "mean_moves": float(np.mean(out["result"].chunk_moves[:, -1])),
                "engine": out["engine"],
            }
            print(f"[curve] {key}: {out['mean_gap']:.4f}%", flush=True)
    # weight control at each budget (model-free)
    wset = TSPDataset.from_arrays(
        data, te, scalers=load_scalers(ROOT / "data" / "tsp100" /
                                       "scalers.json"))
    for b in budgets:
        out = ev.evaluate(wset, guides=["weight"], time_limit=None, n_iters=b)
        key = f"weight@{b}"
        gaps_store[key] = np.asarray(out["gaps"])
        results["rows"][key] = {
            "model": "—", "train_size": 0, "n_iters": int(b),
            "mean_gap_pct": float(out["mean_gap"]),
            "p95_gap_pct": float(np.percentile(out["gaps"], 95)),
            "mean_moves": float(np.mean(out["result"].chunk_moves[:, -1])),
            "engine": out["engine"],
        }
        print(f"[curve] {key}: {out['mean_gap']:.4f}%", flush=True)

    for name in models:
        for b in budgets:
            k = f"{name}@{b}"
            if k in gaps_store:
                results["paired"][f"{name}_vs_weight@{b}"] = stats.paired_compare(
                    gaps_store[k], gaps_store[f"weight@{b}"])
    if "tsp100@{0}".format(budgets[0]) in gaps_store and "tsp100_xl" in models:
        for b in budgets:
            results["paired"][f"xl_vs_2k@{b}"] = stats.paired_compare(
                gaps_store[f"tsp100_xl@{b}"], gaps_store[f"tsp100@{b}"],
                label_a="tsp100_xl", label_b="tsp100")

    with open(ROOT / "benchmarks" / "RESULTS_tsp100_curve.json", "w") as f:
        json.dump(results, f, indent=2, default=float)

    # append the curve to RESULTS_tsp100.md
    md = ROOT / "benchmarks" / "RESULTS_tsp100.md"
    marker = "## Gap vs training-set size"
    lines = [
        "", marker, "",
        "Same 500-instance test split (best-knowns refined by "
        "refine_oracle.py), identical budgets; regret guide per model, "
        "weight = model-free control.",
        "",
        "| guide/model | train size | " +
        " | ".join(f"gap@{b}" for b in budgets) + " |",
        "|---|---|" + "---|" * len(budgets),
    ]
    order = [("weight", "weight", 0)] + [
        (name, name, ts) for name, (ts, _) in models.items()]
    for label, name, ts in order:
        row = [f"| {label} | {ts if ts else '—'} "]
        for b in budgets:
            r = results["rows"].get(f"{name}@{b}")
            row.append(f"| {r['mean_gap_pct']:.4f} " if r else "| — ")
        lines.append("".join(row) + "|")
    lines += ["", "Paired tests (negative diff = first guide better):", ""]
    for k, c in results["paired"].items():
        lines.append(
            f"- {k}: {c['mean_diff']:+.4f}pp "
            f"[{c['diff_ci95'][0]:+.4f}, {c['diff_ci95'][1]:+.4f}], "
            f"p={c['p_value_paired_sign_flip']:.4f}")
    txt = md.read_text() if md.exists() else "# tsp100\n"
    if marker in txt:
        txt = txt[: txt.index(marker)].rstrip() + "\n"
    md.write_text(txt.rstrip() + "\n" + "\n".join(lines) + "\n")
    print(json.dumps({k: v for k, v in results["paired"].items()}, indent=2,
                     default=float))


if __name__ == "__main__":
    main()
