"""Move-operator parity: JAX vectorized vs scalar oracle vs brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracles as O
from gnngls_tpu.search import moves as mv


def rand_instance(n, seed):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2))
    D = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1).astype(np.float32)
    return D


def rand_tour(n, seed):
    rng = np.random.default_rng(seed + 1000)
    perm = rng.permutation(np.arange(1, n))
    return [0] + perm.tolist() + [0]


@pytest.mark.parametrize("n", [5, 7, 12])
def test_delta_formulas_exact_vs_recost(n):
    """Every legal (i, j): predicted delta == recomputed cost difference."""
    D = rand_instance(n, 0)
    tour = rand_tour(n, 0)
    c0 = O.o_tour_cost(D, tour)
    for i in range(1, n):
        for j in range(1, n):
            if abs(i - j) >= 2:
                d = O.o_two_opt_cost(tour, D, i, j)
                t2 = O.o_two_opt(tour, i, j)
                assert abs((O.o_tour_cost(D, t2) - c0) - d) < 1e-4
            if i != j:
                d = O.o_relocate_cost(tour, D, i, j)
                t2 = O.o_relocate(tour, i, j)
                assert abs((O.o_tour_cost(D, t2) - c0) - d) < 1e-4


@pytest.mark.parametrize("n", [6, 10, 25])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_a2a_matches_oracle(n, seed):
    D = rand_instance(n, seed)
    tour = rand_tour(n, seed)
    Dj, tj = jnp.asarray(D), jnp.asarray(tour, dtype=jnp.int32)

    od, ot = O.o_two_opt_a2a(tour, D)
    m = mv.two_opt_a2a(tj, Dj)
    got = np.asarray(jnp.where(m.found, mv.apply_two_opt(tj, m.i, m.j), tj))
    assert got.tolist() == ot
    assert abs(float(m.delta) - od) < 1e-5

    od, ot = O.o_relocate_a2a(tour, D)
    m = mv.relocate_a2a(tj, Dj)
    got = np.asarray(jnp.where(m.found, mv.apply_relocate(tj, m.i, m.j), tj))
    assert got.tolist() == ot
    assert abs(float(m.delta) - od) < 1e-5


@pytest.mark.parametrize("n", [6, 10, 25])
@pytest.mark.parametrize("seed", [3, 4])
def test_o2a_matches_oracle(n, seed):
    D = rand_instance(n, seed)
    tour = rand_tour(n, seed)
    Dj, tj = jnp.asarray(D), jnp.asarray(tour, dtype=jnp.int32)
    for i in range(1, n):
        od, ot = O.o_two_opt_o2a(tour, D, i)
        m = mv.two_opt_o2a(tj, Dj, jnp.int32(i))
        got = np.asarray(jnp.where(m.found, mv.apply_two_opt(tj, m.i, m.j), tj))
        assert got.tolist() == ot, f"two_opt_o2a i={i}"

        od, ot = O.o_relocate_o2a(tour, D, i)
        m = mv.relocate_o2a(tj, Dj, jnp.int32(i))
        got = np.asarray(jnp.where(m.found, mv.apply_relocate(tj, m.i, m.j), tj))
        assert got.tolist() == ot, f"relocate_o2a i={i}"


def test_improving_move_on_local_optimum_not_found():
    """On a 2-opt+relocate local optimum both a2a ops report found=False."""
    D = rand_instance(8, 9)
    tour = rand_tour(8, 9)
    t, c, _ = O.o_local_search(tour, O.o_tour_cost(D, tour), D)
    tj, Dj = jnp.asarray(t, dtype=jnp.int32), jnp.asarray(D)
    assert not bool(mv.two_opt_a2a(tj, Dj).found)
    assert not bool(mv.relocate_a2a(tj, Dj).found)


def test_tour_cost_matches():
    D = rand_instance(9, 2)
    tour = rand_tour(9, 2)
    assert abs(float(mv.tour_cost(jnp.asarray(D), jnp.asarray(tour))) -
               O.o_tour_cost(D, tour)) < 1e-5


@pytest.mark.parametrize("n,seed", [(8, 0), (15, 5)])
def test_first_improvement_matches_oracle(n, seed):
    D = rand_instance(n, seed)
    tour = rand_tour(n, seed)
    Dj, tj = jnp.asarray(D), jnp.asarray(tour, dtype=jnp.int32)

    od, ot = O.o_two_opt_a2a_first(tour, D)
    m = mv.two_opt_a2a(tj, Dj, first_improvement=True)
    got = np.asarray(jnp.where(m.found, mv.apply_two_opt(tj, m.i, m.j), tj))
    assert got.tolist() == ot

    od, ot = O.o_relocate_a2a_first(tour, D)
    m = mv.relocate_a2a(tj, Dj, first_improvement=True)
    got = np.asarray(jnp.where(m.found, mv.apply_relocate(tj, m.i, m.j), tj))
    assert got.tolist() == ot
