"""Grow the tsp100 training set toward reference scale (VERDICT r2 item 7).

The reference trains on 100,000 instances (scripts/preprocess_dataset.py:17-19);
round 2's production run used 2,000.  This script extends the training set
with NEW instances (disjoint seed), keeping the production 500-instance test
split and 200-instance val split byte-identical so gap tables stay
comparable, then retrains and re-evaluates both guides.

Every stage is crash-resumable (chunk shards with metadata validation) and
ships WIP insurance copies into data/tsp100_xl_wip (git-tracked) so progress
survives across rounds.

Usage: python benchmarks/grow_tsp100.py [--extra 5300] [--stage all|data|train]
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

N = 100
BASE = ROOT / "data" / "tsp100" / "instances.npz"  # production round-2 artifact
N_TRAIN0, N_TEST, N_VAL = 2000, 500, 200  # reference carve order: train,test,val
RUN = ROOT / "runs" / "tsp100_xl"
WIP = ROOT / "data" / "tsp100_xl_wip"
SEED = 1  # disjoint from the production run's seed 0


def wip_sync(src_dir: pathlib.Path, pattern: str):
    """Insurance-copy completed shards into the git-tracked WIP dir."""
    WIP.mkdir(parents=True, exist_ok=True)
    for p in sorted(src_dir.glob(pattern)):
        dst = WIP / p.name
        if not dst.exists():
            shutil.copy2(p, dst)


def wip_restore(dst_dir: pathlib.Path, pattern: str):
    dst_dir.mkdir(parents=True, exist_ok=True)
    for p in sorted(WIP.glob(pattern)):
        dst = dst_dir / p.name
        if not dst.exists():
            shutil.copy2(p, dst)


def stage_data(n_extra: int, label_chunk: int = 90,
               max_label_chunks: int | None = 2) -> dict:
    from gnngls_tpu.data import generate, labels

    merged = RUN / "extra_labeled.npz"
    if not merged.exists() and (WIP / "extra_labeled.npz").exists():
        RUN.mkdir(parents=True, exist_ok=True)
        shutil.copy2(WIP / "extra_labeled.npz", merged)
    if merged.exists():
        print("[grow] extra data cached")
        return generate.load_dataset(merged)

    gen_dir = RUN / "gen_shards"
    wip_restore(gen_dir, "gen_*.npz")
    t0 = time.time()
    data = generate.generate_instances_sharded(
        gen_dir, n_extra, N, seed=SEED, solver="gls", opt_iters=100,
        chunk=512)
    wip_sync(gen_dir, "gen_*.npz")
    print(f"[grow] generate done ({time.time()-t0:.0f}s)", flush=True)

    # Short label bouts with clean process exits: the axon worker dies after
    # ~4-5 min of sustained dispatch load (round 4/5 logs), so each process
    # computes a bounded number of small shards and exits 3; the supervisor
    # relaunches until complete.
    lab_dir = RUN / "label_shards"
    wip_restore(lab_dir, "labels_*.npz")
    out = labels.warm_labels_chunked(
        data, lab_dir, chunk=label_chunk, warm_gls_iters=0, dual_splice=True,
        perturbation_moves=20, max_chunks=max_label_chunks, verbose=True)
    wip_sync(lab_dir, "labels_*.npz")
    if out is None:
        n_done = sum(
            int(np.load(p)["regret"].shape[0])
            for p in lab_dir.glob("labels_*.npz") if ".tmp" not in p.name)
        print(f"[grow] labels partial ({n_done}/{n_extra}) — clean exit "
              f"for worker restart", flush=True)
        sys.exit(3)
    data = out
    generate.save_dataset(merged, data)
    shutil.copy2(merged, WIP / "extra_labeled.npz")
    shutil.rmtree(gen_dir, ignore_errors=True)
    shutil.rmtree(lab_dir, ignore_errors=True)
    for p in WIP.glob("gen_*.npz"):
        p.unlink()
    for p in WIP.glob("labels_*.npz"):
        p.unlink()
    return data


def combined_splits(extra: dict):
    """Train = production 2000 + extra; val/test = production splits."""
    from gnngls_tpu.data import generate
    from gnngls_tpu.data.dataset import TSPDataset

    base = generate.load_dataset(BASE)
    tr0 = np.arange(0, N_TRAIN0)
    te = np.arange(N_TRAIN0, N_TRAIN0 + N_TEST)
    va = np.arange(N_TRAIN0 + N_TEST, N_TRAIN0 + N_TEST + N_VAL)

    n_extra = extra["coords"].shape[0]
    full = {
        k: np.concatenate([np.asarray(base[k]), np.asarray(extra[k])])
        for k in ("coords", "opt_tour", "opt_cost", "in_solution", "regret")
    }
    tr = np.concatenate([tr0, np.arange(len(base["coords"]),
                                        len(base["coords"]) + n_extra)])
    train_set = TSPDataset.from_arrays(full, tr)
    scalers = train_set.fit_scalers()
    test_set = TSPDataset.from_arrays(full, te, scalers=scalers)
    val_set = TSPDataset.from_arrays(full, va, scalers=scalers)
    return train_set, val_set, test_set, full, tr, te, va


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--extra", type=int, default=5300)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--stage", choices=("all", "data", "train"), default="all")
    ap.add_argument("--label-chunk", type=int, default=90)
    ap.add_argument("--max-label-chunks", type=int, default=2,
                    help="new label shards per process (<=0: unbounded)")
    args = ap.parse_args(argv)

    RUN.mkdir(parents=True, exist_ok=True)
    extra = stage_data(args.extra, args.label_chunk,
                       args.max_label_chunks if args.max_label_chunks > 0
                       else None)
    if args.stage == "data":
        return

    import jax

    from gap_pipeline import Pipeline
    from gnngls_tpu.core.scaler import save_scalers
    from gnngls_tpu.models import regret_gat as M
    from gnngls_tpu.train import checkpoint as ckpt
    from gnngls_tpu.train.loop import TrainConfig, train_model

    train_set, val_set, test_set, full, tr, te, va = combined_splits(extra)
    print(f"[grow] train {len(train_set)} val {len(val_set)} "
          f"test {len(test_set)}", flush=True)

    run_dir = RUN / "train"
    best = run_dir / "checkpoint_best_val.npz"
    final = run_dir / "checkpoint_final.npz"
    if final.exists():
        print("[train] cached")
    else:
        cfg = TrainConfig(n_epochs=args.epochs, val_on_train=False)
        t0 = time.time()
        _, _, history = train_model(train_set, val_set, cfg, run_dir)
        print(f"[train] {len(history)} epochs in {time.time()-t0:.0f}s, "
              f"final val {history[-1]['val_loss']:.6f}", flush=True)

    tmpl_p, tmpl_b = M.init_params(
        jax.random.PRNGKey(0), M.RegretGNNConfig(in_dim=train_set.feat_dim))
    params, bn_state, _, _ = ckpt.load_checkpoint(
        best if best.exists() else final,
        params_like=tmpl_p, bn_state_like=tmpl_b)

    # reuse the production pipeline's eval + reporting (same budgets incl.
    # the calibrated 10s-protocol), on the SAME 500-instance test split
    pipe = Pipeline(n=N, n_train=len(tr), n_test=N_TEST, n_val=N_VAL,
                    budgets=(5, 100), name="tsp100_xl")
    results = pipe.stage_eval(test_set, params, bn_state)

    # ship: model + scalers (data stays as base npz + extra_labeled.npz)
    dst = ROOT / "models" / "tsp100_xl"
    dst.mkdir(parents=True, exist_ok=True)
    for f in ("checkpoint_best_val.npz", "params.json"):
        src = run_dir / f
        if src.exists():
            shutil.copy2(src, dst / f)
    save_scalers(dst / "scalers.json", test_set.scalers)
    pipe.write_results(results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
