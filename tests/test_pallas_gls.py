"""Whole-GLS Pallas kernel vs the XLA engine (interpret mode on CPU).

In interpret mode all delta arithmetic is exact f32, so the kernel must
reproduce the XLA engine's move sequences exactly: same accepted-move
counts, same best costs — including under multi-guide cycling (reference
algorithms.py:147) and in the per-outer-iteration trace snapshots.  Best
TOURS may legitimately differ when two iterations reach cost-tied tours:
the kernel's post-move cost recompute sums the same f32 values in a
different reduction order (~1 ulp), flipping only the best-update tie
(documented in pallas_gls.py) — `assert_best_match` below accepts an
unequal tour only when the costs tie at ulp level and the tour is valid.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gnngls_tpu.search import batched
from gnngls_tpu.search.pallas_gls import gls_pallas
from gnngls_tpu.utils import is_valid_tour, tour_cost


def instances(n, B, seed):
    rng = np.random.default_rng(seed)
    pos = rng.random((B, n, 2))
    return np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1).astype(np.float32)


def assert_best_match(n, Ds, tours, costs, ref):
    """Per instance: identical best tour, or a cost-tied valid alternative."""
    tours, costs = np.asarray(tours), np.asarray(costs)
    for b in range(len(tours)):
        if np.array_equal(tours[b], ref.best_tours[b]):
            continue
        tt = tours[b]
        assert is_valid_tour(n, tt.tolist())
        true_cost = tour_cost(Ds[b], tt)
        # cost-tied at ulp level: only the best-update tie-break differed
        tol = 8 * np.finfo(np.float32).eps * abs(ref.best_costs[b])
        assert abs(true_cost - ref.best_costs[b]) <= tol, (
            f"instance {b}: tour differs with non-tied cost "
            f"({true_cost} vs {ref.best_costs[b]})")
    np.testing.assert_allclose(costs, ref.best_costs, rtol=2e-6)


@pytest.mark.parametrize("n,B,iters,pm,seed", [
    (10, 3, 2, 4, 0),
    (15, 3, 2, 5, 1),
    (20, 2, 3, 6, 2),
])
def test_pallas_gls_matches_xla_engine(n, B, iters, pm, seed):
    Ds = instances(n, B, seed)
    inits = np.asarray(batched.nearest_neighbor_batch(jnp.asarray(Ds)))
    ref = batched.run_fixed(Ds, Ds[:, None], inits, n_iters=iters,
                            perturbation_moves=pm)
    t, c, m, tr_c, tr_m = gls_pallas(
        jnp.asarray(Ds), jnp.asarray(Ds), jnp.asarray(inits),
        n_iters=iters, perturbation_moves=pm, interpret=True)
    np.testing.assert_array_equal(np.asarray(m).astype(int), ref.trace_n)
    assert_best_match(n, Ds, t, c, ref)
    for b in range(B):
        tt = np.asarray(t[b])
        assert is_valid_tour(n, tt.tolist())
        # kernel-maintained cost agrees with a from-scratch f32 recompute
        assert abs(tour_cost(Ds[b], tt) - float(c[b])) < 1e-3
    # per-iteration traces: monotone best costs ending at the final best,
    # monotone cumulative moves ending at the total
    tr_c, tr_m = np.asarray(tr_c), np.asarray(tr_m)
    assert tr_c.shape == (B, iters) and tr_m.shape == (B, iters)
    assert np.all(np.diff(tr_c, axis=1) <= 1e-6)
    np.testing.assert_allclose(tr_c[:, -1], np.asarray(c), rtol=1e-6)
    assert np.all(np.diff(tr_m, axis=1) >= 0)
    np.testing.assert_array_equal(tr_m[:, -1].astype(int),
                                  np.asarray(m).astype(int))


def test_pallas_gls_regret_guide():
    """A guide different from D exercises the guided-row materialization."""
    n, B = 12, 2
    Ds = instances(n, B, 5)
    guide = instances(n, B, 99)  # arbitrary positive guide
    inits = np.asarray(batched.nearest_neighbor_batch(jnp.asarray(Ds)))
    ref = batched.run_fixed(Ds, guide[:, None], inits, n_iters=2,
                            perturbation_moves=4)
    t, c, m, _, _ = gls_pallas(
        jnp.asarray(Ds), jnp.asarray(guide), jnp.asarray(inits),
        n_iters=2, perturbation_moves=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(m).astype(int), ref.trace_n)
    assert_best_match(n, Ds, t, c, ref)


def test_pallas_gls_guide_cycling():
    """Two cycled guides (KGLS-style, algorithms.py:147) must reproduce the
    XLA engine's guide_stack trajectories exactly — and differ from the
    single-guide run (proving the cycle actually switches guides)."""
    n, B, iters, pm = 12, 2, 4, 4
    Ds = instances(n, B, 7)
    guide2 = instances(n, B, 123)
    stack = np.stack([guide2, Ds], axis=1)  # (B, 2, n, n)
    inits = np.asarray(batched.nearest_neighbor_batch(jnp.asarray(Ds)))
    ref = batched.run_fixed(Ds, stack, inits, n_iters=iters,
                            perturbation_moves=pm)
    t, c, m, _, _ = gls_pallas(
        jnp.asarray(Ds), jnp.asarray(stack), jnp.asarray(inits),
        n_iters=iters, perturbation_moves=pm, interpret=True)
    np.testing.assert_array_equal(np.asarray(m).astype(int), ref.trace_n)
    assert_best_match(n, Ds, t, c, ref)

    m_single = gls_pallas(
        jnp.asarray(Ds), jnp.asarray(guide2), jnp.asarray(inits),
        n_iters=iters, perturbation_moves=pm, interpret=True)[2]
    assert not np.array_equal(np.asarray(m).astype(int),
                              np.asarray(m_single).astype(int))


def test_run_fixed_pallas_multi_guide_traces():
    """The batched driver accepts multi-guide stacks and surfaces the
    kernel's per-iteration traces in BatchResult."""
    n, B, iters = 10, 2, 3
    Ds = instances(n, B, 11)
    stack = np.stack([instances(n, B, 42), Ds], axis=1)
    inits = np.asarray(batched.nearest_neighbor_batch(jnp.asarray(Ds)))
    res = batched.run_fixed_pallas(Ds, stack, inits, n_iters=iters,
                                   perturbation_moves=4, interpret=True)
    ref = batched.run_fixed(Ds, stack, inits, n_iters=iters,
                            perturbation_moves=4)
    assert_best_match(n, Ds, res.best_tours,
                      res.best_costs.astype(np.float32), ref)
    assert res.trace_costs.shape == (B, iters)
    np.testing.assert_allclose(res.trace_costs[:, -1], res.best_costs,
                               rtol=1e-5)
    assert np.all(res.trace_n == iters)
