"""Static K_n line-graph topology for TPU-native message passing.

The reference (gnngls/datasets.py:55-60) builds a DGL line graph of the complete
graph K_n and runs sparse GAT message passing over it (gnngls/models.py:22-24).
On TPU we exploit that this topology is *perfectly regular*: the line-graph node
for TSP edge (u, v) has exactly 2(n-2) neighbors — every other edge incident to
u or to v.  Instead of CSR/SpMM, we decompose the neighborhood into two "city
groups": for each city u, the group S_u of the (n-1) edges incident to u.  A
line-graph node (u, v) aggregates over S_u ∪ S_v minus itself (counted once per
group).  Aggregation then becomes n batched dense (n-1)x(n-1) contractions —
pure MXU work with zero scatter and zero raggedness.

All arrays here are static numpy (host) constants; they become XLA constants
when closed over inside jit.

Edge indexing convention (canonical everywhere in this framework):
  edges of K_n are the unordered pairs (u, v) with u < v, ordered
  lexicographically: (0,1), (0,2), ..., (0,n-1), (1,2), ...
This matches the iteration order of the reference's
`itertools.combinations(G.nodes, 2)` instance builder
(scripts/generate_instances.py:31-33), so feature/label vectors line up with
the reference's edge ordering without any permutation.  (The model is
permutation-equivariant over line-graph nodes, so internal order is free; we
keep the canonical one end to end.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np


class LineGraphTopology(NamedTuple):
    """Static topology of the line graph of K_n.

    Attributes:
      n: number of TSP cities.
      n_edges: E = n(n-1)/2 line-graph nodes (TSP edges).
      edges: (E, 2) int32, the (u, v) pair per edge id, u < v, lexicographic.
      edge_id: (n, n) int32, symmetric lookup pair -> edge id; diagonal = -1.
      city_edges: (n, n-1) int32, for each city u the edge ids incident to u,
        ordered by the other endpoint ascending.
      slot_u: (E,) int32, flattened (city, loc) slot of edge (u, v) inside the
        u-group: u * (n-1) + (v - 1)  [since v > u, the other endpoint v sits
        at local index v-1 in S_u].
      slot_v: (E,) int32, slot inside the v-group: v * (n-1) + u.
      nbr: (E, 2(n-2)) int32, explicit line-graph neighbor lists (edges
        sharing an endpoint, excluding self).  Used only by the naive
        reference-math path and tests; the fast path uses the city groups.
    """

    n: int
    n_edges: int
    edges: np.ndarray
    edge_id: np.ndarray
    city_edges: np.ndarray
    slot_u: np.ndarray
    slot_v: np.ndarray
    nbr: np.ndarray


def n_edges(n: int) -> int:
    return n * (n - 1) // 2


@functools.lru_cache(maxsize=64)
def build_topology(n: int) -> LineGraphTopology:
    """Build the static line-graph topology of K_n.  Cached per n."""
    if n < 3:
        raise ValueError(f"K_n line graph needs n >= 3, got n={n}")
    E = n_edges(n)

    us, vs = np.triu_indices(n, k=1)
    edges = np.stack([us, vs], axis=1).astype(np.int32)  # lexicographic by construction

    edge_id = np.full((n, n), -1, dtype=np.int32)
    eids = np.arange(E, dtype=np.int32)
    edge_id[us, vs] = eids
    edge_id[vs, us] = eids

    # S_u: edges incident to city u, ordered by other endpoint ascending.
    city_edges = np.empty((n, n - 1), dtype=np.int32)
    for u in range(n):
        others = np.concatenate([np.arange(u), np.arange(u + 1, n)])
        city_edges[u] = edge_id[u, others]

    # Edge (u, v), u < v: local index of v in S_u's "others" list is v-1;
    # local index of u in S_v's list is u.
    slot_u = (us * (n - 1) + (vs - 1)).astype(np.int32)
    slot_v = (vs * (n - 1) + us).astype(np.int32)

    # Explicit neighbor lists: S_u \ {e} then S_v \ {e}.  Vectorized: each
    # group row contains e exactly once, so a boolean drop reshapes cleanly.
    su_all = city_edges[us]  # (E, n-1)
    sv_all = city_edges[vs]
    su = su_all[su_all != eids[:, None]].reshape(E, n - 2)
    sv = sv_all[sv_all != eids[:, None]].reshape(E, n - 2)
    nbr = np.concatenate([su, sv], axis=1).astype(np.int32)

    return LineGraphTopology(
        n=n,
        n_edges=E,
        edges=edges,
        edge_id=edge_id,
        city_edges=city_edges,
        slot_u=slot_u,
        slot_v=slot_v,
        nbr=nbr,
    )


def edge_index(n: int, u, v):
    """Edge id of pair (u, v) in the canonical ordering (vectorized ok)."""
    u, v = np.minimum(u, v), np.maximum(u, v)
    return u * (2 * n - u - 1) // 2 + (v - u - 1)


def weights_to_edge_vector(D: np.ndarray) -> np.ndarray:
    """Gather the (E,) per-edge vector of an (n, n) symmetric matrix."""
    n = D.shape[-1]
    us, vs = np.triu_indices(n, k=1)
    return D[..., us, vs]


def edge_vector_to_matrix(x: np.ndarray, n: int, diag=0.0) -> np.ndarray:
    """Scatter an (E,) per-edge vector back to a symmetric (n, n) matrix."""
    us, vs = np.triu_indices(n, k=1)
    M = np.full(x.shape[:-1] + (n, n), diag, dtype=x.dtype)
    M[..., us, vs] = x
    M[..., vs, us] = x
    return M
