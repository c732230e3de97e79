"""10s-protocol calibration: n_iters budget from accepted-move targets."""

import numpy as np

from gnngls_tpu.data import generate
from gnngls_tpu.data.dataset import TSPDataset
from gnngls_tpu.evaluate import calibrate_protocol_iters, evaluate


def _dataset(n=10, N=6):
    data = generate.generate_instances(N, n, seed=1, solver="held_karp")
    from gnngls_tpu.data.labels import compute_regret

    compute_regret(data, method="held_karp")
    ds = TSPDataset.from_arrays(data, np.arange(N))
    ds.fit_scalers()
    return ds


def test_calibrate_protocol_iters_monotone():
    ds = _dataset()
    # a tiny target is met by the small probe budget itself
    b_small = calibrate_protocol_iters(ds, target_moves=1.0,
                                       probe_budgets=(2, 6),
                                       guides=["weight"], engine="xla")
    assert b_small == 2
    # a big target extrapolates to a larger budget (or the saturation cap)
    b_big = calibrate_protocol_iters(ds, target_moves=1e5,
                                     probe_budgets=(2, 6), max_iters=500,
                                     guides=["weight"], engine="xla")
    assert b_big > b_small
    assert b_big <= 500


def test_calibrated_budget_reaches_move_target():
    ds = _dataset()
    target = 25.0
    b = calibrate_protocol_iters(ds, target_moves=target,
                                 probe_budgets=(2, 6), guides=["weight"],
                                 engine="xla")
    out = evaluate(ds, n_iters=b, guides=["weight"], time_limit=None,
                   engine="xla")
    got = float(np.mean(out["result"].chunk_moves[:, -1]))
    # linear extrapolation + move accrual is noisy; demand the right ballpark
    assert got >= 0.6 * target
