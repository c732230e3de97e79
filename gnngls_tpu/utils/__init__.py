"""Core tour utilities (host-side, numpy).

Mirrors the behavior of the reference's gnngls/__init__.py:9-44 (tour <-> edge
attributes, tour cost, validity/equivalence checks) on plain arrays instead of
networkx graphs.  Device-side (jax) equivalents used inside jitted search live
in gnngls_tpu.search.moves.
"""

from __future__ import annotations

import numpy as np

from ..core import graph as _graph


def tour_cost(D: np.ndarray, tour) -> float:
    """Cost of a closed tour (depot-to-depot node list) under matrix D.

    Reference: gnngls/__init__.py:17-21 (sums edge weights over consecutive
    pairs; the tour includes the closing depot).
    """
    t = np.asarray(tour)
    return float(D[t[:-1], t[1:]].sum())


def tour_to_edge_vector(n: int, tour) -> np.ndarray:
    """(E,) bool vector: which K_n edges the closed tour uses.

    Reference: gnngls/__init__.py:9-14 (undirected membership).
    """
    t = np.asarray(tour)
    out = np.zeros(_graph.n_edges(n), dtype=bool)
    out[_graph.edge_index(n, t[:-1], t[1:])] = True
    return out


def is_valid_tour(n: int, tour) -> bool:
    """Starts/ends at depot 0, depot appears twice, every other node once.

    Reference: gnngls/__init__.py:32-44.
    """
    t = list(np.asarray(tour).tolist())
    if len(t) != n + 1 or t[0] != 0 or t[-1] != 0:
        return False
    counts = np.bincount(np.asarray(t), minlength=n)
    return counts[0] == 2 and bool((counts[1:] == 1).all()) and len(counts) == n


def is_equivalent_tour(tour_a, tour_b) -> bool:
    """Equal or reversed.  Reference: gnngls/__init__.py:24-29."""
    a = list(np.asarray(tour_a).tolist())
    b = list(np.asarray(tour_b).tolist())
    return a == b or a == b[::-1]
