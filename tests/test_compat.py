"""Reference-API compatibility layer over networkx graphs."""

import itertools

import matplotlib

matplotlib.use("Agg")

import networkx as nx
import numpy as np
import pytest

from gnngls_tpu import compat


def make_graph(n, seed):
    rng = np.random.default_rng(seed)
    G = nx.Graph()
    coords = rng.random((n, 2))
    for v, p in enumerate(coords):
        G.add_node(v, pos=p)
    for u, v in itertools.combinations(range(n), 2):
        G.add_edge(u, v, weight=float(np.linalg.norm(coords[u] - coords[v])))
    return G


def test_full_reference_workflow():
    """The reference's per-graph flow: solve -> labels -> NN -> GLS."""
    import time

    G = make_graph(9, 0)
    tour = compat.optimal_tour(G)
    assert compat.is_valid_tour(G.number_of_nodes(), tour)

    in_sol = compat.tour_to_edge_attribute(G, tour)
    nx.set_edge_attributes(G, in_sol, "in_solution")
    assert sum(in_sol.values()) == 9

    opt = compat.optimal_cost(G)
    assert abs(opt - compat.tour_cost(G, tour)) < 1e-9

    compat.set_features(G)
    compat.set_labels(G)
    regrets = [G.edges[e]["regret"] for e in G.edges]
    assert all(r >= 0 for r in regrets)
    assert any(r > 0 for r in regrets)
    assert all(G.edges[e]["regret"] == 0 for e in G.edges if G.edges[e]["in_solution"])

    init = compat.nearest_neighbor(G, 0)
    assert compat.is_valid_tour(9, init)
    init_cost = compat.tour_cost(G, init)

    best_tour, best_cost, progress = compat.guided_local_search(
        G, init, init_cost, time.time() + 3.0, perturbation_moves=5)
    assert compat.is_valid_tour(9, best_tour)
    assert best_cost <= init_cost + 1e-6
    assert abs(best_cost - opt) / opt < 0.05  # n=9 should be near-solved
    assert all("time" in row and "cost" in row for row in progress)


def test_fixed_edge_tour_contains_edge():
    G = make_graph(7, 1)
    for e in [(0, 3), (2, 5)]:
        tour = compat.fixed_edge_tour(G, e)
        pairs = set(zip(tour[:-1], tour[1:])) | set(zip(tour[1:], tour[:-1]))
        assert e in pairs


def test_plot_edge_attribute():
    import matplotlib.pyplot as plt

    G = make_graph(6, 2)
    attr = {e: G.edges[e]["weight"] for e in G.edges}
    fig, ax = plt.subplots()
    compat.plot_edge_attribute(G, attr, ax)
    plt.close(fig)


def test_equivalent_tour():
    assert compat.is_equivalent_tour([0, 1, 2, 0], [0, 2, 1, 0])
    assert not compat.is_equivalent_tour([0, 1, 2, 3, 0], [0, 2, 1, 3, 0])
