"""Reference-compatible API surface over networkx graphs.

The reference package exposes graph-level helpers operating on
``networkx.Graph`` instances (gnngls/__init__.py, gnngls/datasets.py,
gnngls/algorithms.py).  This module provides the same names with the same
signatures and behavior, implemented over the array core, so code written
against proroklab/gnngls ports by changing one import:

    from gnngls_tpu import compat as gnngls

Array-first equivalents live in the rest of the package; these wrappers are
thin conversions, not the TPU hot path.
"""

from __future__ import annotations

import numpy as np

from .core.graph import build_topology, edge_index
from .utils import is_equivalent_tour, is_valid_tour  # noqa: F401  (same API)


def _weight_matrix(G, weight: str = "weight") -> np.ndarray:
    n = G.number_of_nodes()
    D = np.zeros((n, n))
    for (u, v), data in G.edges.items():
        D[u, v] = D[v, u] = data[weight]
    return D


def tour_to_edge_attribute(G, tour) -> dict:
    """gnngls/__init__.py:9-14: {edge: bool in-tour} (undirected)."""
    tour_edges = set(zip(tour[:-1], tour[1:]))
    return {e: (e in tour_edges or tuple(reversed(e)) in tour_edges)
            for e in G.edges}


def tour_cost(G, tour, weight: str = "weight") -> float:
    """gnngls/__init__.py:17-21."""
    return float(sum(G.edges[e][weight] for e in zip(tour[:-1], tour[1:])))


def optimal_cost(G, weight: str = "weight") -> float:
    """gnngls/__init__.py:55-60: sum of weights over 'in_solution' edges."""
    return float(sum(d[weight] for d in G.edges.values() if d["in_solution"]))


def optimal_tour(G, scale: float = 1e3):
    """gnngls/__init__.py:47-52 — exact tour via the best available oracle
    (Concorde binary if present, else native/Held-Karp; `scale` only matters
    for the Concorde text format)."""
    from .data import solvers

    coords = np.vstack([G.nodes[i]["pos"] for i in sorted(G.nodes)])
    if solvers.has_concorde():
        return solvers.concorde_tour(coords, scale=scale)
    D = _weight_matrix(G)
    try:
        from .data import native_oracle

        tour, _ = native_oracle.held_karp(D)
        return list(map(int, tour))
    except (RuntimeError, ValueError):
        tour, _ = solvers.held_karp(D)
        return tour


def fixed_edge_tour(G, e, scale: float = 1e3, lkh_path: str = "LKH", **kwargs):
    """gnngls/__init__.py:63-74 — near-optimal tour through edge e (LKH if
    installed, else exact forced-edge Held-Karp)."""
    from .data import solvers

    if solvers.has_lkh(lkh_path):
        coords = np.vstack([G.nodes[i]["pos"] for i in sorted(G.nodes)])
        return solvers.lkh_fixed_edge_tour(coords, e, scale=scale,
                                           lkh_path=lkh_path, **kwargs)
    D = _weight_matrix(G)
    tour, _ = solvers.held_karp_fixed_edge(D, tuple(e))
    return tour


def plot_edge_attribute(G, attr, ax, **kwargs):
    """gnngls/__init__.py:77-85: red alpha-ramp colormap over an edge attr."""
    import networkx as nx
    from matplotlib import colors

    cmap_colors = np.zeros((100, 4))
    cmap_colors[:, 0] = 1.0
    cmap_colors[:, 3] = np.linspace(0, 1, 100)
    cmap = colors.ListedColormap(cmap_colors)
    pos = nx.get_node_attributes(G, "pos")
    nx.draw(G, pos, edge_color=list(attr.values()), edge_cmap=cmap, ax=ax, **kwargs)


def set_features(G) -> None:
    """gnngls/datasets.py:14-20: per-edge feature vector = [weight]."""
    for e in G.edges:
        G.edges[e]["features"] = np.array([G.edges[e]["weight"]], dtype=np.float32)


def set_labels(G) -> None:
    """gnngls/datasets.py:23-34: per-edge regret labels."""
    opt = optimal_cost(G)
    for e in G.edges:
        if G.edges[e]["in_solution"]:
            G.edges[e]["regret"] = 0.0
        else:
            tour = fixed_edge_tour(G, e)
            G.edges[e]["regret"] = max((tour_cost(G, tour) - opt) / opt, 0.0)


def nearest_neighbor(G, depot, weight: str = "weight"):
    """gnngls/algorithms.py:9-18 over a graph attribute."""
    import jax.numpy as jnp

    from .search.construct import nearest_neighbor as nn

    return [int(x) for x in np.asarray(nn(jnp.asarray(_weight_matrix(G, weight),
                                                      dtype=jnp.float32), depot))]


def guided_local_search(G, init_tour, init_cost, t_lim, weight="weight",
                        guides=("weight",), perturbation_moves=30,
                        first_improvement=False):
    """gnngls/algorithms.py:135-195 signature over a graph; wall-clock limit.

    Runs compiled single-instance GLS in host-chunked outer iterations until
    ``t_lim`` (an absolute time.time() deadline, like the reference).
    Returns (best_tour, best_cost, search_progress) with reference-style
    {time, cost} rows.
    """
    import time as _time

    import jax.numpy as jnp

    from .search import batched

    D = _weight_matrix(G, weight).astype(np.float32)
    guide_mats = np.stack(
        [_weight_matrix(G, g).astype(np.float32) for g in guides])[None]
    init = np.asarray(init_tour, dtype=np.int32)[None]

    states = batched.batch_init(jnp.asarray(D)[None], jnp.asarray(guide_mats),
                                jnp.asarray(init), 4096, first_improvement)
    progress = []
    prev_n = 0
    while _time.time() < t_lim:
        states = batched.batch_chunk(states, jnp.asarray(D)[None],
                                     jnp.asarray(guide_mats), 1,
                                     perturbation_moves, first_improvement)
        n_tr = int(np.asarray(states.trace.n)[0])
        now = _time.time()
        costs = np.asarray(states.trace.costs)[0]
        for m in range(prev_n, min(n_tr, costs.shape[0])):
            progress.append({"time": now, "cost": float(costs[m])})
        prev_n = n_tr
    best_tour = [int(x) for x in np.asarray(states.best_tour)[0]]
    return best_tour, float(np.asarray(states.best_cost)[0]), progress
