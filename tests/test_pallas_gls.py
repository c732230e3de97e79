"""Whole-GLS Pallas kernel vs the XLA engine (interpret mode on CPU).

In interpret mode all arithmetic is exact f32, so the kernel must reproduce
the XLA engine's trajectories exactly: same best tours, same costs, same
accepted-move counts.
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
    t, c, m = gls_pallas(jnp.asarray(Ds), jnp.asarray(Ds), jnp.asarray(inits),
                         n_iters=iters, perturbation_moves=pm, interpret=True)
    np.testing.assert_array_equal(np.asarray(t), ref.best_tours)
    np.testing.assert_allclose(np.asarray(c), ref.best_costs, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m).astype(int), ref.trace_n)
    for b in range(B):
        tt = np.asarray(t[b])
        assert is_valid_tour(n, tt.tolist())
        # kernel-maintained cost agrees with a from-scratch f32 recompute
        assert abs(tour_cost(Ds[b], tt) - float(c[b])) < 1e-3


def test_pallas_gls_regret_guide():
    """A guide different from D exercises the MG maintenance path."""
    n, B = 12, 2
    Ds = instances(n, B, 5)
    guide = instances(n, B, 99)  # arbitrary positive guide
    inits = np.asarray(batched.nearest_neighbor_batch(jnp.asarray(Ds)))
    ref = batched.run_fixed(Ds, guide[:, None], inits, n_iters=2,
                            perturbation_moves=4)
    t, c, m = gls_pallas(jnp.asarray(Ds), jnp.asarray(guide), jnp.asarray(inits),
                         n_iters=2, perturbation_moves=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(t), ref.best_tours)
    np.testing.assert_allclose(np.asarray(c), ref.best_costs, rtol=1e-5)
