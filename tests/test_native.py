"""Native C++ oracle: builds, matches the numpy exact solver, threads."""

import numpy as np
import pytest

from gnngls_tpu.data import generate as gen, labels as lb, native_oracle as no, solvers
from gnngls_tpu.utils import is_valid_tour, tour_cost

pytestmark = pytest.mark.skipif(not no.build(), reason="no C++ toolchain")


def rand_D(n, seed):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2))
    return np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)


@pytest.mark.parametrize("n,seed", [(6, 0), (9, 1), (12, 2)])
def test_native_held_karp_matches_numpy(n, seed):
    D = rand_D(n, seed)
    t_np, c_np = solvers.held_karp(D)
    t_c, c_c = no.held_karp(D)
    assert abs(c_c - c_np) < 1e-9
    assert is_valid_tour(n, t_c.tolist())
    assert abs(tour_cost(D, t_c) - c_c) < 1e-9


@pytest.mark.parametrize("n,seed", [(7, 3)])
def test_native_fixed_edge_matches_numpy(n, seed):
    D = rand_D(n, seed)
    from gnngls_tpu.core.graph import build_topology

    for u, v in map(tuple, build_topology(n).edges):
        _, c_np = solvers.held_karp_fixed_edge(D, (u, v))
        t_c, c_c = no.held_karp_fixed_edge(D, u, v)
        assert abs(c_c - c_np) < 1e-6
        pairs = set(zip(t_c[:-1], t_c[1:])) | set(zip(t_c[1:], t_c[:-1]))
        assert (u, v) in pairs


def test_native_local_search_reasonable():
    n = 40
    D = rand_D(n, 4)
    t, c = no.local_search(D)
    assert is_valid_tour(n, t.tolist())
    assert abs(tour_cost(D, t) - c) < 1e-9
    # local optimum should beat plain nearest neighbor
    import oracles as O

    nn_cost = O.o_tour_cost(D, O.o_nearest_neighbor(D, 0))
    assert c <= nn_cost + 1e-9


def test_native_regret_labels_match_exact():
    data = gen.generate_instances(3, 9, seed=5)
    exact = lb.compute_regret(dict(data), method="held_karp").copy()
    native = lb.compute_regret(dict(data), method="native")
    np.testing.assert_allclose(native, exact, rtol=1e-5, atol=1e-7)


def test_native_batch_threads():
    Ds = np.stack([rand_D(8, 10 + i) for i in range(6)])
    costs = no.regret_costs_batch(Ds, workers=4)
    assert costs.shape == (6, 28)
    assert (costs > 0).all()
