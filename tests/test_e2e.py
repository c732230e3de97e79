"""End-to-end: the README minimal example through the CLI entry points.

Reference README.md:53-63: generate -> preprocess -> train -> test.  Scaled
down (n=8, 40 instances, 3 epochs) with exact Held-Karp labels so ground-truth
gaps are real optimality gaps.
"""

import json
import pathlib

import numpy as np
import pytest

from gnngls_tpu.cli import generate_instances, preprocess_dataset, test as test_cli, train as train_cli


@pytest.mark.slow
def test_minimal_example(tmp_path, capsys, monkeypatch):
    data_dir = tmp_path / "data"
    generate_instances.main(["40", "8", str(data_dir), "--seed", "0"])
    assert (data_dir / "instances.npz").exists()

    preprocess_dataset.main([str(data_dir), "--n_train", "28", "--n_val", "6",
                             "--n_test", "6", "--seed", "0"])
    assert (data_dir / "scalers.json").exists()
    assert len(np.loadtxt(data_dir / "test.txt", dtype=int, ndmin=1)) == 6

    # regenerating scalers must refuse (preprocess_dataset.py:22-23)
    with pytest.raises(SystemExit):
        preprocess_dataset.main([str(data_dir)])
    # regenerating the dataset dir must refuse (generate_instances.py:49-52)
    with pytest.raises(SystemExit):
        generate_instances.main(["1", "8", str(data_dir)])

    models_dir = tmp_path / "models"
    train_cli.main([str(data_dir), str(models_dir), "--embed_dim", "16",
                    "--n_heads", "2", "--n_epochs", "3", "--batch_size", "8"])
    run_dirs = list(models_dir.iterdir())
    assert len(run_dirs) == 1
    ckpt = run_dirs[0] / "checkpoint_best_val.npz"
    assert ckpt.exists()
    assert json.load(open(run_dirs[0] / "params.json"))["embed_dim"] == 16

    runs_dir = tmp_path / "runs"
    test_cli.main([str(data_dir / "test.txt"), str(ckpt), str(runs_dir),
                   "regret_pred", "--n_iters", "4",
                   "--perturbation_moves", "5"])
    captured = capsys.readouterr().out
    assert "mean gap" in captured

    out_files = list(runs_dir.iterdir())
    assert len(out_files) == 1
    import pandas as pd

    df = pd.read_pickle(out_files[0])
    assert {"instance", "time", "cost", "opt_cost", "best_cost", "gap", "dt"} <= set(df.columns)
    # per-instance best gap must be >= 0 (labels are exact optima at n=8)
    final_gaps = df.groupby("instance")["gap"].min()
    assert (final_gaps >= -1e-4).all()
    # n=8 with any search budget should essentially solve every instance
    assert final_gaps.mean() < 1.0


@pytest.mark.slow
def test_weight_guided_no_model(tmp_path):
    """guides=['weight'] path needs no checkpoint (test.py:87-88)."""
    data_dir = tmp_path / "data"
    generate_instances.main(["10", "8", str(data_dir), "--seed", "1"])
    preprocess_dataset.main([str(data_dir), "--n_train", "6", "--n_val", "2",
                             "--n_test", "2", "--seed", "0"])
    runs_dir = tmp_path / "runs"
    test_cli.main([str(data_dir / "test.txt"), str(data_dir / "nonexistent.npz"),
                   str(runs_dir), "weight", "--n_iters", "3",
                   "--perturbation_moves", "5"])
    assert len(list(runs_dir.iterdir())) == 1
