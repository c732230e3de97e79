"""Crash-resumable data generation and labeling (VERDICT r1 item 6).

Reference parity: scripts/generate_instances.py:57 writes one pickle per
instance as it goes, so a killed label run resumes.  Our resumption unit is
a chunk shard; these tests pin (a) restart determinism, (b) shard reuse,
(c) the CLI --resume flow.
"""

import numpy as np
import pytest

from gnngls_tpu.data import generate as gen, labels as lb


def test_generate_sharded_resume_deterministic(tmp_path):
    d1 = gen.generate_instances_sharded(tmp_path / "s", 6, 12, seed=3,
                                        chunk=4, verbose=False)
    # simulate a crash that lost the merge but kept shards: re-run
    d2 = gen.generate_instances_sharded(tmp_path / "s", 6, 12, seed=3,
                                        chunk=4, verbose=False)
    np.testing.assert_array_equal(d1["coords"], d2["coords"])
    np.testing.assert_array_equal(d1["opt_tour"], d2["opt_tour"])

    # simulate a crash that lost one shard: chunk coords are derived from
    # (seed, chunk_start), so the regenerated shard is identical
    (tmp_path / "s" / "gen_00000004.npz").unlink()
    d3 = gen.generate_instances_sharded(tmp_path / "s", 6, 12, seed=3,
                                        chunk=4, verbose=False)
    np.testing.assert_array_equal(d1["coords"], d3["coords"])
    np.testing.assert_allclose(d1["opt_cost"], d3["opt_cost"], rtol=1e-12)


def test_warm_labels_chunked_resume(tmp_path):
    data = gen.generate_instances(8, 12, seed=5, solver="held_karp")
    ref = {k: np.array(v) for k, v in data.items()}
    out1 = lb.warm_labels_chunked(dict(ref), tmp_path / "lab", chunk=3)

    # restart from completed shards: identical labels, refined optima kept
    out2 = lb.warm_labels_chunked(dict(ref), tmp_path / "lab", chunk=3)
    np.testing.assert_array_equal(out1["regret"], out2["regret"])
    np.testing.assert_array_equal(out1["opt_tour"], out2["opt_tour"])

    # lose a shard mid-run: only that chunk recomputes, same result
    (tmp_path / "lab" / "labels_00000003.npz").unlink()
    out3 = lb.warm_labels_chunked(dict(ref), tmp_path / "lab", chunk=3)
    np.testing.assert_array_equal(out1["regret"], out3["regret"])

    # labels are valid: zero on solution edges, non-negative elsewhere
    assert (out1["regret"] >= 0).all()
    assert (out1["regret"][out1["in_solution"]] == 0).all()
    # exact optima at n=12: refinement must never "improve" below them
    assert (out1["opt_cost"] >= ref["opt_cost"] - 1e-9).all()


def test_cli_generate_resume_flag(tmp_path):
    from gnngls_tpu.cli import generate_instances as cli

    out = tmp_path / "ds"
    cli.main([str(4), str(10), str(out), "--chunk", "2"])
    assert (out / "instances.npz").exists()
    with pytest.raises(SystemExit):
        cli.main([str(4), str(10), str(out), "--chunk", "2"])
    # --resume on a complete run is a no-op rebuild from cached shards...
    # (shards were cleaned; it regenerates deterministically)
    cli.main([str(4), str(10), str(out), "--chunk", "2", "--resume"])
    d = gen.load_dataset(out / "instances.npz")
    assert d["regret"].shape[0] == 4


def test_warm_labels_chunked_bounded_bouts(tmp_path):
    """max_chunks bouts + mixed shard sizes reproduce an unbounded run.

    Round 5: the axon worker dies after ~5 min of sustained dispatch load,
    so production labeling runs as short bouts (max_chunks per process,
    clean exit between) — shard sizes may then vary across restarts and
    lost shards leave gaps that are refilled with exactly-sized shards."""
    data = gen.generate_instances(8, 12, seed=5, solver="held_karp")
    ref = {k: np.array(v) for k, v in data.items()}
    full = lb.warm_labels_chunked(dict(ref), tmp_path / "full", chunk=3)

    out = None
    for bout in range(10):
        out = lb.warm_labels_chunked(dict(ref), tmp_path / "b", chunk=2,
                                     max_chunks=1)
        if out is not None:
            break
    assert out is not None and bout == 3  # shards 0-2, then 3 + completion
    np.testing.assert_array_equal(out["regret"], full["regret"])

    # lose a middle 2-sized shard, refill with chunk=5: the gap gets an
    # exactly-sized fill shard and the rest is reused
    (tmp_path / "b" / "labels_00000004.npz").unlink()
    out2 = lb.warm_labels_chunked(dict(ref), tmp_path / "b", chunk=5)
    np.testing.assert_array_equal(out2["regret"], full["regret"])
    np.testing.assert_array_equal(out2["opt_tour"], full["opt_tour"])
