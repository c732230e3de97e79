"""Solved-instance generation (reference: scripts/generate_instances.py).

Instances are uniform random points in [0,1]^2 with Euclidean weights
(generate_instances.py:27-33).  Ground-truth optimal tours come from the
tiered oracle in .solvers: Concorde binary if present, exact Held-Karp for
small n, else our own large-budget GLS (documented fidelity difference).

TPU-native storage: instead of one pickled networkx graph per instance
(generate_instances.py:57), a dataset is a dict of dense arrays
  coords       (N, n, 2) f32
  opt_tour     (N, n+1) i32
  opt_cost     (N,) f64
  in_solution  (N, E) bool     canonical lexicographic edge order
  regret       (N, E) f32      (added by labels.compute_regret)
saved as a single .npz shard — directly memory-mappable into device batches.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.graph import build_topology
from ..utils import tour_to_edge_vector


def coords_to_distance_matrix(coords: np.ndarray) -> np.ndarray:
    """(..., n, 2) -> (..., n, n) Euclidean weights."""
    d = coords[..., :, None, :] - coords[..., None, :, :]
    return np.sqrt((d * d).sum(-1)).astype(np.float32)


def generate_instances(n_samples: int, n_nodes: int, seed: int = 0,
                       solver: Optional[str] = None) -> dict:
    """Generate solved instances.  solver in {None (auto), 'held_karp',
    'gls', 'concorde'}."""
    from . import solvers

    rng = np.random.default_rng(seed)
    coords = rng.random((n_samples, n_nodes, 2)).astype(np.float32)
    D = coords_to_distance_matrix(coords)

    from . import native_oracle

    native_hk_max = 22  # C++ DP stays tractable a bit past the numpy limit

    if solver is None:
        if solvers.has_concorde():
            solver = "concorde"
        elif n_nodes <= solvers.HELD_KARP_MAX_N or (
                n_nodes <= native_hk_max and native_oracle.available()):
            solver = "held_karp"
        else:
            solver = "gls"

    if solver == "concorde":
        tours = np.stack([solvers.concorde_tour(c) for c in coords])
        costs = np.array([D[i][tours[i][:-1], tours[i][1:]].sum()
                          for i in range(n_samples)], dtype=np.float64)
    elif solver == "held_karp":
        if native_oracle.available():
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor() as ex:
                pairs = list(ex.map(lambda Di: native_oracle.held_karp(
                    Di.astype(np.float64)), D))
        else:
            pairs = [solvers.held_karp(Di) for Di in D]
        tours = np.stack([np.asarray(t, dtype=np.int32) for t, _ in pairs])
        costs = np.array([c for _, c in pairs], dtype=np.float64)
    elif solver == "gls":
        tours, costs = solvers.gls_oracle(D)
        costs = costs.astype(np.float64)
    else:
        raise ValueError(f"unknown solver {solver!r}")

    in_solution = np.stack([tour_to_edge_vector(n_nodes, t) for t in tours])
    return {
        "coords": coords,
        "opt_tour": np.asarray(tours, dtype=np.int32),
        "opt_cost": costs,
        "in_solution": in_solution,
        "solver": np.array(solver),
        "n_nodes": np.array(n_nodes),
    }


def save_dataset(path, data: dict) -> None:
    np.savez_compressed(path, **data)


def load_dataset(path) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
