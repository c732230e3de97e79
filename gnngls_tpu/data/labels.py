"""Feature and regret-label computation (reference: gnngls/datasets.py:14-34).

Features: per-edge vector = [weight] (datasets.py:14-20), canonical edge order.
Labels: regret(e) = 0 if e is in the optimal solution, else
  (cost of best tour forced through e - opt_cost) / opt_cost  (datasets.py:23-34).

The reference's per-edge LKH loop (the data-gen hot spot, SURVEY §3.1) becomes
one vmapped device batch of forced-edge GLS solves per instance, or exact
Held-Karp big-M solves for small n.
"""

from __future__ import annotations

import numpy as np

from ..core.graph import build_topology
from .generate import coords_to_distance_matrix


def edge_features(coords: np.ndarray) -> np.ndarray:
    """(..., n, 2) coords -> (..., E, 1) feature vectors (= edge weight)."""
    n = coords.shape[-2]
    topo = build_topology(n)
    D = coords_to_distance_matrix(coords)
    w = D[..., topo.edges[:, 0], topo.edges[:, 1]]
    return w[..., None].astype(np.float32)


def compute_regret(data: dict, *, method: str = "auto", n_iters: int = 10,
                   perturbation_moves: int = 30, verbose: bool = False) -> np.ndarray:
    """Per-edge regret labels for a generated dataset dict.

    method: 'auto' | 'held_karp' | 'gls' | 'lkh'.
    Returns (N, E) f32 and stores it in data['regret'].
    """
    from . import solvers

    coords = data["coords"]
    N, n, _ = coords.shape
    topo = build_topology(n)
    E = topo.n_edges
    opt_cost = np.asarray(data["opt_cost"], dtype=np.float64)
    in_sol = np.asarray(data["in_solution"], dtype=bool)

    if method == "auto":
        from . import native_oracle

        if solvers.has_lkh():
            method = "lkh"
        elif native_oracle.available():
            method = "native"
        elif n <= solvers.HELD_KARP_MAX_N:
            method = "held_karp"
        else:
            method = "gls"

    regret = np.zeros((N, E), dtype=np.float32)
    Ds = coords_to_distance_matrix(coords).astype(np.float64)

    if method == "native":
        # C++ oracle, threaded across instances (GIL released in C calls)
        from . import native_oracle

        costs_all = native_oracle.regret_costs_batch(Ds)
        r = (costs_all - opt_cost[:, None]) / opt_cost[:, None]
        r[in_sol] = 0.0
        regret = np.maximum(r, 0.0).astype(np.float32)
        data["regret"] = regret
        return regret

    for i in range(N):
        D = Ds[i]
        if method == "held_karp":
            costs = np.empty(E)
            for e in range(E):
                if in_sol[i, e]:
                    costs[e] = opt_cost[i]
                else:
                    _, costs[e] = solvers.held_karp_fixed_edge(D, tuple(topo.edges[e]))
        elif method == "gls":
            costs, used = solvers.gls_fixed_edge_costs(
                D, topo.edges, n_iters=n_iters,
                perturbation_moves=perturbation_moves)
            # rare: forced edge dropped by the heuristic -> exact fallback for
            # small n, else the (upper-bound) unforced cost is kept
            if not used.all() and n <= solvers.HELD_KARP_MAX_N:
                for e in np.flatnonzero(~used):
                    _, costs[e] = solvers.held_karp_fixed_edge(D, tuple(topo.edges[e]))
        elif method == "lkh":
            costs = np.empty(E)
            for e in range(E):
                if in_sol[i, e]:
                    costs[e] = opt_cost[i]
                else:
                    t = solvers.lkh_fixed_edge_tour(coords[i], tuple(topo.edges[e]))
                    t = np.asarray(t)
                    costs[e] = D[t[:-1], t[1:]].sum()
        else:
            raise ValueError(f"unknown method {method!r}")

        r = (costs - opt_cost[i]) / opt_cost[i]
        r[in_sol[i]] = 0.0  # datasets.py:26-27: solution edges have zero regret
        regret[i] = np.maximum(r, 0.0)  # heuristic oracles may dip epsilon-negative
        if verbose and (i + 1) % 50 == 0:
            print(f"regret labels: {i + 1}/{N}")

    data["regret"] = regret
    return regret
