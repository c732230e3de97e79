"""Topology tests: canonical edge order, city groups, line-graph adjacency.

Oracle: networkx line_graph of a complete graph — the same construction the
reference uses (gnngls/datasets.py:55-60) — compared structurally against our
static index arrays.
"""

import itertools

import networkx as nx
import numpy as np
import pytest

from gnngls_tpu.core import graph as G


@pytest.mark.parametrize("n", [3, 4, 5, 8, 11])
def test_edge_order_matches_combinations(n):
    topo = G.build_topology(n)
    expected = list(itertools.combinations(range(n), 2))
    assert topo.n_edges == len(expected)
    assert [tuple(e) for e in topo.edges] == expected
    # closed-form index function agrees
    for eid, (u, v) in enumerate(expected):
        assert G.edge_index(n, u, v) == eid
        assert G.edge_index(n, v, u) == eid  # symmetric
        assert topo.edge_id[u, v] == eid
        assert topo.edge_id[v, u] == eid


@pytest.mark.parametrize("n", [4, 6, 9])
def test_city_groups_and_slots(n):
    topo = G.build_topology(n)
    # Every edge appears in exactly its two endpoint groups.
    for eid, (u, v) in enumerate(topo.edges):
        assert eid in topo.city_edges[u]
        assert eid in topo.city_edges[v]
        assert topo.city_edges.flatten()[topo.slot_u[eid]] == eid
        assert topo.city_edges.flatten()[topo.slot_v[eid]] == eid
    # Each group has all n-1 incident edges.
    for u in range(n):
        incident = {eid for eid, (a, b) in enumerate(topo.edges) if u in (a, b)}
        assert set(topo.city_edges[u].tolist()) == incident


@pytest.mark.parametrize("n", [4, 5, 7, 10])
def test_neighbors_match_networkx_line_graph(n):
    topo = G.build_topology(n)
    Kn = nx.complete_graph(n)
    lG = nx.line_graph(Kn)
    for eid, (u, v) in enumerate(topo.edges):
        ours = sorted(topo.nbr[eid].tolist())
        key = (u, v) if (u, v) in lG else (v, u)
        theirs = sorted(
            topo.edge_id[min(a, b), max(a, b)] for a, b in lG.neighbors(key)
        )
        assert ours == theirs
        assert len(ours) == 2 * (n - 2)
        assert eid not in ours  # no self loops


def test_edge_vector_matrix_roundtrip():
    n = 7
    rng = np.random.default_rng(0)
    x = rng.random(G.n_edges(n)).astype(np.float32)
    M = G.edge_vector_to_matrix(x, n)
    assert np.allclose(M, M.T)
    assert np.allclose(G.weights_to_edge_vector(M), x)
