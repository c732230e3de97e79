"""Warm-start forced-edge label oracle vs the exact Held-Karp oracle.

The production label pipeline replaces the reference's per-edge LKH solve
(gnngls/datasets.py:23-34) with `solvers.warm_fixed_edge_costs`: splice the
forced edge into the best-known tour, big-M reduce, descend + a few GLS
iterations.  These tests pin its two contracts:
  * the forced edge is ALWAYS in the returned tour (`used` by construction);
  * costs are valid upper bounds on the exact forced-tour cost, and tight.
"""

import numpy as np
import pytest

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.data import solvers
from gnngls_tpu.utils import is_valid_tour


def _instance(n, seed):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2))
    D = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    return D


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_warm_oracle_vs_exact(seed):
    n = 10
    D = _instance(n, seed)
    topo = build_topology(n)
    opt_tour, opt_cost = solvers.held_karp(D)

    exact = np.array([solvers.held_karp_fixed_edge(D, tuple(e))[1]
                      for e in topo.edges])
    costs, used, tours = solvers.warm_fixed_edge_costs(
        D, topo.edges, np.asarray(opt_tour), n_gls_iters=3, dual_splice=True)

    assert used.all(), "forced edge must stay in the tour by construction"
    for t in tours:
        assert is_valid_tour(n, t)
    # upper bounds on the exact forced cost (up to f32 search noise).
    # Measured across seeds: mean rel err ~5e-4, with rare stubborn edges
    # trapped ~2% above the constrained optimum (same class of noise as the
    # reference's heuristic LKH labels, gnngls/datasets.py:30).
    assert (costs >= exact - 1e-6).all()
    rel = (costs - exact) / exact
    assert rel.mean() < 2e-3, f"mean rel err {rel.mean():.2e}"
    assert rel.max() < 5e-2, f"max rel err {rel.max():.2e}"
    # edges already in the optimal tour cost exactly the optimum
    in_sol = np.zeros(topo.n_edges, bool)
    a, b = np.asarray(opt_tour[:-1]), np.asarray(opt_tour[1:])
    for u, vv in zip(a, b):
        u, vv = min(u, vv), max(u, vv)
        eid = np.flatnonzero((topo.edges[:, 0] == u) & (topo.edges[:, 1] == vv))
        in_sol[eid] = True
    assert np.allclose(costs[in_sol], opt_cost, rtol=1e-5)


def test_warm_oracle_matches_cold_oracle_quality():
    """At n=30 the warm oracle matches the from-scratch GLS oracle's mean
    label quality at a fraction of the compute (round-1 labels used
    gls_fixed_edge_costs; the production pipeline uses this)."""
    n = 30
    D = _instance(n, 7)
    topo = build_topology(n)
    tours, cost = solvers.gls_oracle(D[None], n_iters=50)
    best_tour = tours[0]

    warm, usedw, _ = solvers.warm_fixed_edge_costs(
        D, topo.edges, best_tour, n_gls_iters=3, dual_splice=True)
    cold, usedc = solvers.gls_fixed_edge_costs(D, topo.edges, n_iters=5)

    assert usedw.all()
    ok = usedc  # only compare where the cold oracle honoured the edge
    # individual solves trade tiny wins/losses (different basins); the mean
    # forced-tour cost must be at least as good as cold's
    assert warm[ok].mean() <= cold[ok].mean() + 1e-4 * cold[ok].mean()
