"""Search-loop parity: jitted local search / GLS vs the scalar oracle.

The strongest gate from SURVEY.md §4.3: on seeded instances the vectorized
JAX engine must produce *identical tour trajectories* to reference semantics
under a fixed move budget.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oracles as O
from gnngls_tpu.search import construct, local_search as ls, moves as mv
from gnngls_tpu.utils import is_valid_tour


def rand_instance(n, seed):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2))
    return np.linalg.norm(pos[:, None] - pos[None, :], axis=-1).astype(np.float32)


@pytest.mark.parametrize("n,seed", [(8, 0), (12, 1), (20, 2), (30, 3)])
def test_nearest_neighbor_matches_oracle(n, seed):
    D = rand_instance(n, seed)
    want = O.o_nearest_neighbor(D, 0)
    got = np.asarray(construct.nearest_neighbor(jnp.asarray(D), 0)).tolist()
    assert got == want
    assert is_valid_tour(n, got)


@pytest.mark.parametrize("n,seed", [(8, 0), (15, 1), (25, 2)])
def test_local_search_trajectory_matches_oracle(n, seed):
    D = rand_instance(n, seed)
    tour = O.o_nearest_neighbor(D, 0)
    cost0 = O.o_tour_cost(D, tour)
    ot, oc, oprog = O.o_local_search(list(tour), cost0, D)

    res = ls.local_search(jnp.asarray(tour, dtype=jnp.int32), jnp.float32(cost0),
                          jnp.asarray(D), ls.make_trace(512))
    assert np.asarray(res.tour).tolist() == ot
    assert abs(float(res.cost) - oc) < 1e-3
    n_moves = int(res.trace.n)
    assert n_moves == len(oprog)
    np.testing.assert_allclose(np.asarray(res.trace.costs)[:n_moves],
                               np.asarray(oprog), rtol=2e-4, atol=2e-4)
    # incremental cost must match from-scratch recomputation
    assert abs(float(res.cost) - O.o_tour_cost(D, np.asarray(res.tour).tolist())) < 1e-3


@pytest.mark.parametrize("n,seed,iters", [(10, 0, 3), (15, 1, 3), (20, 2, 2)])
def test_gls_trajectory_matches_oracle(n, seed, iters):
    D = rand_instance(n, seed)
    init = O.o_nearest_neighbor(D, 0)
    obest, ocost, oprog = O.o_guided_local_search(D, D, list(init), iters,
                                                  perturbation_moves=5)

    out = ls.guided_local_search(jnp.asarray(D), jnp.asarray(D)[None],
                                 jnp.asarray(init, dtype=jnp.int32),
                                 n_iters=iters, perturbation_moves=5)
    assert np.asarray(out.best_tour).tolist() == obest
    assert abs(float(out.best_cost) - ocost) < 1e-3
    n_moves = int(out.trace.n)
    assert n_moves == len(oprog), f"{n_moves} vs {len(oprog)} accepted moves"
    np.testing.assert_allclose(np.asarray(out.trace.costs)[:n_moves],
                               np.asarray(oprog), rtol=2e-4, atol=2e-4)
    assert is_valid_tour(n, np.asarray(out.best_tour).tolist())


def test_gls_improves_and_vmaps():
    n, B = 20, 8
    Ds = np.stack([rand_instance(n, 100 + b) for b in range(B)])
    inits = np.stack([O.o_nearest_neighbor(D, 0) for D in Ds]).astype(np.int32)

    run = jax.vmap(lambda D, t: ls.guided_local_search(
        D, D[None], t, n_iters=3, perturbation_moves=5))
    out = run(jnp.asarray(Ds), jnp.asarray(inits))
    init_costs = np.asarray([O.o_tour_cost(D, t) for D, t in zip(Ds, inits)])
    best = np.asarray(out.best_cost)
    assert (best <= init_costs + 1e-5).all()
    assert (best < init_costs - 1e-3).any()
    for b in range(B):
        assert is_valid_tour(n, np.asarray(out.best_tour[b]).tolist())


def test_probabilistic_nn_valid_and_guarded():
    n = 12
    D = rand_instance(n, 7)
    key = jax.random.PRNGKey(0)
    t = np.asarray(construct.probabilistic_nearest_neighbour(key, jnp.asarray(D), 0))
    assert is_valid_tour(n, t.tolist())
    # all-zero guide -> uniform guard path still yields a valid tour
    t2 = np.asarray(construct.probabilistic_nearest_neighbour(
        key, jnp.zeros((n, n)), 0, invert=False))
    assert is_valid_tour(n, t2.tolist())
    # inf guide values -> indicator guard
    Dinf = jnp.asarray(D).at[:, 3].set(jnp.inf)
    t3 = np.asarray(construct.probabilistic_nearest_neighbour(key, Dinf, 0, invert=False))
    assert is_valid_tour(n, t3.tolist())


def test_best_probabilistic_nn():
    n = 10
    D = rand_instance(n, 11)
    t = np.asarray(construct.best_probabilistic_nearest_neighbour(
        jax.random.PRNGKey(1), jnp.asarray(D), 0, 8))
    assert is_valid_tour(n, t.tolist())


def test_insertion_heuristics_valid():
    n = 9
    D = rand_instance(n, 13)
    for mode in ("nearest", "farthest", "random"):
        t = construct.insertion(D, 0, mode, rng=np.random.default_rng(0))
        assert is_valid_tour(n, t)
