"""Parameterized end-to-end gap pipeline: generate -> label -> train -> eval.

Generalization of the tsp20 run (see tsp20_gap.py, which wraps this with its
original defaults) to any instance size:

  * optima: exact Held-Karp (native C++) for n <= 22, else the large-budget
    batched GLS oracle — in that regime reported "gaps" are vs best-known,
    not proven optima (stated in the output);
  * regret labels: batched TPU GLS forced-edge solves (reference semantics:
    one LKH run per edge, gnngls/datasets.py:23-34);
  * training: reference defaults (train.py:74-86);
  * eval: Pallas fast engine across iteration budgets, regret-guided vs
    weight-guided.

Stages cache under runs/<name>/ and are resumable.  Usage:
  python benchmarks/gap_pipeline.py --n 50 --train 500 --test 100 --val 50 \
      --label-iters 8 --budgets 5,100
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


class Pipeline:
    def __init__(self, *, n, n_train, n_test, n_val, label_iters=10,
                 label_moves=30, budgets=(5, 100), label_chunk=250,
                 n_epochs=100, name=None, exact_claim=None,
                 label_oracle="warm", opt_iters=100, warm_gls_iters=0,
                 dual_splice=True, gen_chunk=512, protocol=True,
                 table_note=None):
        self.n = n
        self.n_train, self.n_test, self.n_val = n_train, n_test, n_val
        self.n_total = n_train + n_test + n_val
        self.label_iters, self.label_moves = label_iters, label_moves
        self.budgets = tuple(budgets)
        self.label_chunk = label_chunk
        self.n_epochs = n_epochs
        self.name = name or f"tsp{n}"
        self.run = ROOT / "runs" / self.name
        # n <= 22: native Held-Karp gives proven optima
        self.exact = (n <= 22) if exact_claim is None else exact_claim
        self.label_oracle = label_oracle
        self.opt_iters = opt_iters
        self.warm_gls_iters = warm_gls_iters
        self.dual_splice = dual_splice
        self.gen_chunk = gen_chunk
        self.protocol = protocol
        self.table_note = table_note

    # -- stages ---------------------------------------------------------

    def wip_dir(self):
        """git-tracked insurance copies of run artifacts (runs/ is neither
        gitignored-tracked nor guaranteed to survive between rounds)."""
        return ROOT / "data" / f"{self.name}_wip"

    def stage_generate(self):
        from gnngls_tpu.data import generate

        path = self.run / "dataset.npz"
        if not path.exists() and (self.wip_dir() / "dataset.npz").exists():
            self.run.mkdir(parents=True, exist_ok=True)
            shutil.copy2(self.wip_dir() / "dataset.npz", path)
        if path.exists():
            print("[generate] cached")
            return generate.load_dataset(path)
        t0 = time.time()
        solver = "held_karp" if self.exact else "gls"
        data = generate.generate_instances_sharded(
            self.run / "gen_shards", self.n_total, self.n, seed=0,
            solver=solver, opt_iters=self.opt_iters, chunk=self.gen_chunk)
        generate.save_dataset(path, data)
        shutil.rmtree(self.run / "gen_shards", ignore_errors=True)
        print(f"[generate] {self.n_total} instances ({solver}) "
              f"in {time.time()-t0:.0f}s")
        return data

    def stage_labels(self, data):
        if self.label_oracle == "warm":
            return self.stage_labels_warm(data)
        return self.stage_labels_cold(data)

    def stage_labels_warm(self, data):
        """Production label oracle: warm-start forced-edge solves from the
        best-known tour (solvers.warm_fixed_edge_costs), with best-known
        REFINEMENT — whenever a forced-edge tour beats the stage-1 oracle,
        it becomes the new best-known and all regrets are measured against
        it.  Reference semantics: regret_e = (cost(tour through e) -
        opt_cost)/opt_cost, 0 for optimal-tour edges (gnngls/datasets.py:23-34).
        """
        from gnngls_tpu.core.graph import build_topology
        from gnngls_tpu.data import generate, solvers
        from gnngls_tpu.utils import tour_to_edge_vector

        path = self.run / "dataset_labeled.npz"
        if path.exists():
            print("[labels] cached")
            return generate.load_dataset(path)

        topo = build_topology(self.n)
        Ds = generate.coords_to_distance_matrix(data["coords"]).astype(np.float64)
        N = self.n_total

        regret = np.zeros((N, topo.n_edges), dtype=np.float32)
        opt_tour = np.asarray(data["opt_tour"], dtype=np.int32).copy()
        # f64 re-derivation (stage-1 costs come from the f32 search engine)
        opt = Ds[np.arange(N)[:, None], opt_tour[:, :-1], opt_tour[:, 1:]].sum(-1)
        n_refined = 0
        for s in range(0, N, self.label_chunk):
            part = self.run / f"labels_{s}.npz"
            e = min(s + self.label_chunk, N)
            if not part.exists() and (self.wip_dir() / part.name).exists():
                shutil.copy2(self.wip_dir() / part.name, part)
            if part.exists():
                with np.load(part) as z:
                    regret[s:e] = z["regret"]
                    opt_tour[s:e] = z["opt_tour"]
                    opt[s:e] = z["opt_cost"]
                continue
            t0 = time.time()
            for i in range(s, e):
                costs, used, tours = solvers.warm_fixed_edge_costs(
                    Ds[i], topo.edges, opt_tour[i],
                    n_gls_iters=self.warm_gls_iters,
                    perturbation_moves=self.label_moves,
                    dual_splice=self.dual_splice, edge_chunk=8192)
                assert used.all()  # guaranteed by construction
                j = int(costs.argmin())
                if costs[j] < opt[i] - 1e-9:
                    n_refined += 1
                    opt[i] = costs[j]
                    opt_tour[i] = tours[j]
                r = (costs - opt[i]) / opt[i]
                in_sol_i = tour_to_edge_vector(self.n, opt_tour[i])
                r[in_sol_i] = 0.0
                regret[i] = np.maximum(r, 0.0)
            tmp = part.with_suffix(".tmp.npz")
            np.savez(tmp, regret=regret[s:e], opt_tour=opt_tour[s:e],
                     opt_cost=opt[s:e])
            tmp.rename(part)
            print(f"[labels] {e}/{N} ({(time.time()-t0)/(e-s):.2f}s/inst, "
                  f"{n_refined} refined)", flush=True)

        data["regret"] = regret
        data["opt_tour"] = opt_tour
        data["opt_cost"] = opt
        data["in_solution"] = np.stack(
            [tour_to_edge_vector(self.n, t) for t in opt_tour])
        generate.save_dataset(path, data)
        for s in range(0, N, self.label_chunk):
            (self.run / f"labels_{s}.npz").unlink(missing_ok=True)
        return data

    def stage_labels_cold(self, data):
        from gnngls_tpu.core.graph import build_topology
        from gnngls_tpu.data import generate, solvers

        path = self.run / "dataset_labeled.npz"
        if path.exists():
            print("[labels] cached")
            return generate.load_dataset(path)

        topo = build_topology(self.n)
        Ds = generate.coords_to_distance_matrix(data["coords"]).astype(np.float64)
        opt = np.asarray(data["opt_cost"], dtype=np.float64)
        in_sol = np.asarray(data["in_solution"], dtype=bool)
        N = self.n_total

        regret = np.zeros((N, topo.n_edges), dtype=np.float32)
        for s in range(0, N, self.label_chunk):
            part = self.run / f"labels_{s}.npy"
            e = min(s + self.label_chunk, N)
            if part.exists():
                regret[s:e] = np.load(part)
                continue
            t0 = time.time()
            for i in range(s, e):
                costs, used = solvers.gls_fixed_edge_costs(
                    Ds[i], topo.edges, n_iters=self.label_iters,
                    perturbation_moves=self.label_moves)
                if not used.all():
                    # forced edge dropped (should not happen with big-M
                    # forcing and valid tours): the returned cost is the
                    # unforced cost + M, a wild over-estimate — clamp to the
                    # worst honest forced cost instead
                    print(f"[labels] warn: instance {i}: "
                          f"{int((~used).sum())} forced edges dropped")
                    if used.any():
                        costs[~used] = costs[used].max()
                    else:
                        # every forced edge dropped: no honest forced cost
                        # exists — fall back to the unforced tour cost so the
                        # regret degenerates to ~0 instead of crashing the run
                        costs[:] = opt[i]
                r = (costs - opt[i]) / opt[i]
                r[in_sol[i]] = 0.0
                regret[i] = np.maximum(r, 0.0)
            np.save(part, regret[s:e])
            print(f"[labels] {e}/{N} ({(time.time()-t0)/(e-s):.2f}s/inst)")

        data["regret"] = regret
        generate.save_dataset(path, data)
        for s in range(0, N, self.label_chunk):
            (self.run / f"labels_{s}.npy").unlink(missing_ok=True)
        return data

    def make_splits(self, data):
        from gnngls_tpu.data.dataset import TSPDataset

        # reference carve order: train, then test, then val (preprocess:29-31)
        tr = np.arange(0, self.n_train)
        te = np.arange(self.n_train, self.n_train + self.n_test)
        va = np.arange(self.n_train + self.n_test, self.n_total)
        train_set = TSPDataset.from_arrays(data, tr)
        scalers = train_set.fit_scalers()
        test_set = TSPDataset.from_arrays(data, te, scalers=scalers)
        val_set = TSPDataset.from_arrays(data, va, scalers=scalers)
        return train_set, val_set, test_set

    def stage_train(self, train_set, val_set):
        import jax

        from gnngls_tpu.models import regret_gat as M
        from gnngls_tpu.train import checkpoint as ckpt
        from gnngls_tpu.train.loop import TrainConfig, train_model

        run_dir = self.run / "train"
        best = run_dir / "checkpoint_best_val.npz"
        final = run_dir / "checkpoint_final.npz"

        def load_best():
            tmpl_p, tmpl_b = M.init_params(
                jax.random.PRNGKey(0),
                M.RegretGNNConfig(in_dim=train_set.feat_dim))
            params, bn_state, _, _ = ckpt.load_checkpoint(
                best if best.exists() else final,
                params_like=tmpl_p, bn_state_like=tmpl_b)
            return params, bn_state

        if final.exists():
            print("[train] cached")
            return load_best()
        cfg = TrainConfig(n_epochs=self.n_epochs, val_on_train=False)
        t0 = time.time()
        _, _, history = train_model(train_set, val_set, cfg, run_dir)
        print(f"[train] {len(history)} epochs in {time.time()-t0:.0f}s, "
              f"final val {history[-1]['val_loss']:.6f}")
        return load_best()

    def stage_eval(self, test_set, params, bn_state):
        from gnngls_tpu.evaluate import (REFERENCE_10S_MOVES,
                                         calibrate_protocol_iters, evaluate)
        from gnngls_tpu.models import regret_gat as M

        cfg = M.RegretGNNConfig(in_dim=test_set.feat_dim)
        budgets = [(b, str(b)) for b in self.budgets]
        if self.protocol and self.n in REFERENCE_10S_MOVES:
            # reference protocol: 10 s/instance of single-thread search
            # (test.py:26-27) -> equivalent fixed iteration budget
            target = REFERENCE_10S_MOVES[self.n]
            b10 = calibrate_protocol_iters(test_set, target_moves=target,
                                           guides=["weight"])
            budgets.append((b10, f"{b10} (=10s-protocol, "
                            f"{target:.0f} ref moves)"))
            print(f"[eval] 10s-protocol calibration: n_iters={b10}")
        results = {}
        for n_iters, blabel in budgets:
            budget_gaps = {}
            for label, kw in (
                ("regret_pred", dict(params=params, bn_state=bn_state,
                                     model_cfg=cfg, guides=["regret_pred"])),
                ("weight", dict(guides=["weight"])),
            ):
                t0 = time.time()
                out = evaluate(test_set, time_limit=None, n_iters=n_iters,
                               perturbation_moves=20, **kw)
                dt = time.time() - t0
                budget_gaps[label] = np.asarray(out["gaps"])
                init_gap = float(
                    (out["init_costs"] / out["opt_costs"] - 1).mean() * 100)
                results[f"{label}@{blabel}"] = {
                    "guide": label, "n_iters": n_iters, "budget": blabel,
                    "mean_gap_pct": out["mean_gap"],
                    "p95_gap_pct": float(np.percentile(out["gaps"], 95)),
                    "frac_optimal": float((out["gaps"] < 1e-4).mean()),
                    "mean_init_gap_pct": init_gap,
                    # achieved search work, quoted alongside gaps whenever a
                    # calibrated protocol budget is used (ADVICE r2)
                    "mean_accepted_moves": float(
                        np.mean(out["result"].chunk_moves[:, -1])),
                    "batch_wall_s": dt,
                    "wall_s_per_instance": dt / len(test_set),
                    # engine that actually ran (auto-routing sends n<50 to
                    # the XLA engine, evaluate.py:106) — ADVICE r3
                    "engine": out["engine"],
                }
                print(f"[eval] {label}@{blabel}: mean gap "
                      f"{out['mean_gap']:.4f}%  ({dt:.1f}s batch)", flush=True)
            # paired head-to-head at this budget: bootstrap CIs + sign-flip
            # p-value on the SAME test instances (VERDICT r3 item 6)
            if len(budget_gaps) == 2:
                from gnngls_tpu.stats import paired_compare

                cmp_ = paired_compare(budget_gaps["regret_pred"],
                                      budget_gaps["weight"])
                results[f"paired@{blabel}"] = dict(cmp_, budget=blabel,
                                                   kind="paired_comparison")
                print(f"[eval] paired@{blabel}: diff "
                      f"{cmp_['mean_diff']:+.4f}pp "
                      f"[{cmp_['diff_ci95'][0]:+.4f}, "
                      f"{cmp_['diff_ci95'][1]:+.4f}] "
                      f"p={cmp_['p_value_paired_sign_flip']:.4f}", flush=True)
        return results

    def ship(self, test_set):
        from gnngls_tpu.core.scaler import save_scalers

        dst = ROOT / "models" / self.name
        dst.mkdir(parents=True, exist_ok=True)
        for f in ("checkpoint_best_val.npz", "params.json"):
            src = self.run / "train" / f
            if src.exists():
                shutil.copy2(src, dst / f)
        save_scalers(dst / "scalers.json", test_set.scalers)
        ddir = ROOT / "data" / self.name
        ddir.mkdir(parents=True, exist_ok=True)
        shutil.copy2(self.run / "dataset_labeled.npz", ddir / "instances.npz")
        save_scalers(ddir / "scalers.json", test_set.scalers)
        np.savetxt(ddir / "train.txt", np.arange(0, self.n_train), fmt="%d")
        np.savetxt(ddir / "test.txt",
                   np.arange(self.n_train, self.n_train + self.n_test), fmt="%d")
        np.savetxt(ddir / "val.txt",
                   np.arange(self.n_train + self.n_test, self.n_total), fmt="%d")

    def write_results(self, results):
        (ROOT / "benchmarks").mkdir(exist_ok=True)
        with open(ROOT / "benchmarks" / f"RESULTS_{self.name}.json", "w") as f:
            json.dump(results, f, indent=2)
        opt_kind = ("exact Held-Karp optima" if self.exact
                    else "best-known from the large-budget GLS oracle "
                         "(NOT proven optima)")
        if self.label_oracle == "warm":
            label_desc = (f"warm-start forced-edge oracle "
                          f"(descent+{self.warm_gls_iters} GLS iters"
                          f"{', dual splice' if self.dual_splice else ''}, "
                          f"best-known refined by forced-tour minima)")
        else:
            label_desc = (f"batched TPU GLS forced-edge oracle "
                          f"({self.label_iters} iters)")
        lines = [
            f"# {self.name} gap — self-trained model",
            "",
            f"{self.n_total} uniform instances; reference solutions = {opt_kind}.",
            f"Labels: {label_desc}.  Model: reference defaults.",
            f"Eval: {self.n_test} held-out instances, "
            f"{'/'.join(sorted({r.get('engine', '?') for r in results.values()}))}"
            " GLS engine (as actually routed by evaluate()), "
            "20 perturbation moves/iter; gap vs the reference solution.",
            "",
            "| guide | outer iters | mean gap % | p95 gap % | optimal rate "
            "| init gap % | moves/inst | s/instance |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in results.values():
            if r.get("kind") == "paired_comparison":
                continue
            mv = r.get("mean_accepted_moves")
            lines.append(
                f"| {r['guide']} | {r.get('budget', r['n_iters'])} | "
                f"{r['mean_gap_pct']:.4f} | "
                f"{r['p95_gap_pct']:.4f} | {r['frac_optimal']:.3f} | "
                f"{r['mean_init_gap_pct']:.2f} | "
                f"{'—' if mv is None else f'{mv:.0f}'} | "
                f"{r['wall_s_per_instance']:.4f} |")
        paired = [r for r in results.values()
                  if r.get("kind") == "paired_comparison"]
        if paired:
            lines += [
                "",
                "## Paired regret_pred vs weight (same instances, per budget)",
                "",
                "| budget | mean diff (pp) | 95% CI | p (sign-flip) "
                "| % regret strictly better |",
                "|---|---|---|---|---|",
            ]
            for r in paired:
                lines.append(
                    f"| {r['budget']} | {r['mean_diff']:+.4f} | "
                    f"[{r['diff_ci95'][0]:+.4f}, {r['diff_ci95'][1]:+.4f}] | "
                    f"{r['p_value_paired_sign_flip']:.4f} | "
                    f"{100*r['frac_a_strictly_better']:.1f}% |")
            lines += [
                "",
                "Negative diff = regret-guided better.  CI: percentile "
                "bootstrap over instances (10k resamples); p: two-sided "
                "paired sign-flip permutation test (20k permutations) on "
                "per-instance gap differences (gnngls_tpu/stats.py).",
            ]
        if self.table_note:
            lines += ["", self.table_note]
        with open(ROOT / "benchmarks" / f"RESULTS_{self.name}.md", "w") as f:
            f.write("\n".join(lines) + "\n")

    def main(self):
        self.run.mkdir(parents=True, exist_ok=True)
        data = self.stage_generate()
        data = self.stage_labels(data)
        train_set, val_set, test_set = self.make_splits(data)
        params, bn_state = self.stage_train(train_set, val_set)
        results = self.stage_eval(test_set, params, bn_state)
        self.ship(test_set)
        self.write_results(results)
        print(json.dumps(results, indent=2))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--train", type=int, default=500)
    ap.add_argument("--test", type=int, default=100)
    ap.add_argument("--val", type=int, default=50)
    ap.add_argument("--label-iters", type=int, default=10,
                    help="GLS iters for the cold oracle")
    ap.add_argument("--label-moves", type=int, default=30)
    ap.add_argument("--label-oracle", choices=("warm", "cold"), default="warm")
    ap.add_argument("--warm-gls-iters", type=int, default=0)
    ap.add_argument("--no-dual-splice", action="store_true")
    ap.add_argument("--opt-iters", type=int, default=100,
                    help="GLS budget for best-known tours (n > 22)")
    ap.add_argument("--label-chunk", type=int, default=250)
    ap.add_argument("--budgets", type=str, default="5,100")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--no-protocol", action="store_true",
                    help="skip the 10s-protocol calibrated budget")
    args = ap.parse_args(argv)
    Pipeline(n=args.n, n_train=args.train, n_test=args.test, n_val=args.val,
             label_iters=args.label_iters, label_moves=args.label_moves,
             label_oracle=args.label_oracle, warm_gls_iters=args.warm_gls_iters,
             dual_splice=not args.no_dual_splice, opt_iters=args.opt_iters,
             label_chunk=args.label_chunk,
             budgets=tuple(int(b) for b in args.budgets.split(",")),
             n_epochs=args.epochs, protocol=not args.no_protocol).main()


if __name__ == "__main__":
    main()
