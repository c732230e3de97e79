"""Constructive tour heuristics.

JAX fixed-shape equivalents of the reference constructors
(gnngls/algorithms.py:9-108).  `nearest_neighbor` is the only one used by the
shipped pipeline (scripts/test.py:85, guided by predicted regret); the rest
are kept as API surface.  Insertion heuristics are host-side numpy (they are
O(n^3) scalar reference utilities, not hot paths).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def nearest_neighbor(W: jax.Array, depot) -> jax.Array:
    """Greedy min-attribute tour over guide matrix W, closed at the depot.

    Matches gnngls/algorithms.py:9-18 (ties -> lowest node id, the order
    Python's min() sees from G.neighbors).  W may be any per-edge guide
    (true weights or predicted regret); the diagonal is ignored.
    """
    n = W.shape[0]
    depot = jnp.asarray(depot, jnp.int32)

    iota = jnp.arange(n, dtype=jnp.int32)

    def step(carry, _):
        cur, visited = carry
        row = jnp.where(visited, jnp.inf, W[cur])
        nxt = jnp.argmin(row).astype(jnp.int32)
        # one-hot OR instead of visited.at[nxt].set(True): batched bool
        # scatters inside scan miscompile on TPU at vmap widths >= ~1024
        # (observed: visited stops updating -> repeated cities)
        return (nxt, visited | (iota == nxt)), nxt

    visited = iota == depot
    (_, _), order = jax.lax.scan(step, (depot, visited), None, length=n - 1)
    return jnp.concatenate([depot[None], order, depot[None]])


@partial(jax.jit, static_argnames=("invert",))
def probabilistic_nearest_neighbour(key, W: jax.Array, depot, invert: bool = True) -> jax.Array:
    """Sample the next city proportional to the (inverted) guide.

    Matches gnngls/algorithms.py:21-50 including the guards: if any candidate
    guide value is +inf, sampling weights collapse to the inf indicator; if
    all weights are zero, they become uniform; `invert` flips p -> 1/p.
    """
    n = W.shape[0]
    depot = jnp.asarray(depot, jnp.int32)

    def step(carry, k):
        cur, visited = carry
        p = W[cur]
        is_inf = jnp.isinf(p)
        any_inf = is_inf.any()
        p = jnp.where(any_inf, is_inf.astype(W.dtype), p)
        masked_sum = jnp.where(visited, 0.0, p).sum()
        p = jnp.where(masked_sum == 0.0, jnp.ones_like(p), p)
        if invert:
            p = 1.0 / p
        logits = jnp.where(visited, -jnp.inf, jnp.log(p))
        nxt = jax.random.categorical(k, logits).astype(jnp.int32)
        return (nxt, visited | (jnp.arange(n) == nxt)), nxt

    visited = jnp.arange(n) == depot
    keys = jax.random.split(key, n - 1)
    (_, _), order = jax.lax.scan(step, (depot, visited), keys)
    return jnp.concatenate([depot[None], order, depot[None]])


def best_probabilistic_nearest_neighbour(key, W, depot, n_iters: int, guide=None):
    """Best of n_iters probabilistic samples by true cost.

    Matches gnngls/algorithms.py:53-64.  `guide` defaults to W.
    """
    from .moves import tour_cost

    guide = W if guide is None else guide
    keys = jax.random.split(key, n_iters)
    tours = jax.vmap(lambda k: probabilistic_nearest_neighbour(k, guide, depot))(keys)
    costs = jax.vmap(lambda t: tour_cost(W, t))(tours)
    return tours[jnp.argmin(costs)]


# ---------------------------------------------------------------------------
# Host-side insertion heuristics (reference API surface, algorithms.py:67-108)


def cheapest_insertion(W: np.ndarray, sub_tour, node) -> list:
    """Insert `node` into the closed sub-tour at the position of least cost.

    Matches gnngls/algorithms.py:67-79 (full re-costing per position; first
    minimum wins).
    """
    sub_tour = list(sub_tour)
    best, best_cost = None, None
    for j in range(1, len(sub_tour)):
        cand = sub_tour[:j] + [node] + sub_tour[j:]
        cost = float(np.asarray(W)[cand[:-1], cand[1:]].sum())
        if best is None or cost < best_cost:
            best, best_cost = cand, cost
    return best


def insertion(W: np.ndarray, depot: int, mode: str = "farthest", rng=None) -> list:
    """Random/nearest/farthest insertion.  Matches gnngls/algorithms.py:82-108."""
    assert mode in ("random", "nearest", "farthest"), f"Unknown mode: {mode}"
    W = np.asarray(W)
    n = W.shape[0]
    rng = np.random.default_rng() if rng is None else rng
    nodes = [x for x in range(n) if x != depot]
    tour = [depot, depot]
    while nodes:
        if mode == "random":
            nxt = int(rng.choice(nodes))
        else:
            nxt, nxt_cost = None, None
            for i in tour:
                for j in nodes:
                    w = W[i, j]
                    if (nxt is None or (mode == "nearest" and w < nxt_cost)
                            or (mode == "farthest" and w > nxt_cost)):
                        nxt, nxt_cost = j, w
        nodes.remove(nxt)
        tour = cheapest_insertion(W, tour, nxt)
    return tour
