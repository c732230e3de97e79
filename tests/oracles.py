"""Scalar reference-semantics oracles for the search engine.

Independent re-implementations (plain Python/numpy, written from the semantic
spec in SURVEY.md §2 C12-C16) of the reference's move operators and search
loops.  Deliberately scalar and slow; used only to verify that the vectorized
JAX engine reproduces move-for-move identical trajectories.
"""

import numpy as np


def o_tour_cost(D, tour):
    return float(sum(D[a, b] for a, b in zip(tour[:-1], tour[1:])))


def _accept(delta, best):
    return delta < best and not np.isclose(0, delta)


def o_two_opt_cost(tour, D, i, j):
    if i == j:
        return 0.0
    if j < i:
        i, j = j, i
    return float(D[tour[i], tour[j]] + D[tour[i - 1], tour[j - 1]]
                 - D[tour[i], tour[i - 1]] - D[tour[j], tour[j - 1]])


def o_two_opt(tour, i, j):
    if i == j:
        return tour
    if j < i:
        i, j = j, i
    return tour[:i] + tour[i:j][::-1] + tour[j:]


def o_two_opt_a2a(tour, D):
    best_move, best_delta = None, 0.0
    m = len(tour) - 1
    for i in range(1, m):
        for j in range(i + 1, m):
            if abs(i - j) < 2:
                continue
            d = o_two_opt_cost(tour, D, i, j)
            if _accept(d, best_delta):
                best_delta, best_move = d, (i, j)
    if best_move is None:
        return 0.0, tour
    return best_delta, o_two_opt(tour, *best_move)


def o_two_opt_o2a(tour, D, i):
    assert 0 < i < len(tour) - 1
    best_move, best_delta = None, 0.0
    for j in range(1, len(tour) - 1):
        if abs(i - j) < 2:
            continue
        d = o_two_opt_cost(tour, D, i, j)
        if _accept(d, best_delta):
            best_delta, best_move = d, (i, j)
    if best_move is None:
        return 0.0, tour
    return best_delta, o_two_opt(tour, *best_move)


def o_relocate(tour, i, j):
    t = tour.copy()
    node = t.pop(i)
    t.insert(j, node)
    return t


def o_relocate_cost(tour, D, i, j):
    if i == j:
        return 0.0
    a, b, c = tour[i - 1], tour[i], tour[i + 1]
    if i < j:
        d, e = tour[j], tour[j + 1]
    else:
        d, e = tour[j - 1], tour[j]
    return float(-D[a, b] - D[b, c] + D[a, c] - D[d, e] + D[d, b] + D[b, e])


def o_relocate_a2a(tour, D):
    best_move, best_delta = None, 0.0
    m = len(tour) - 1
    for i in range(1, m):
        for j in range(1, m):
            if i == j or i - j == 1:
                continue
            d = o_relocate_cost(tour, D, i, j)
            if _accept(d, best_delta):
                best_delta, best_move = d, (i, j)
    if best_move is None:
        return 0.0, tour
    return best_delta, o_relocate(tour, *best_move)


def o_relocate_o2a(tour, D, i):
    assert 0 < i < len(tour) - 1
    best_move, best_delta = None, 0.0
    for j in range(1, len(tour) - 1):
        if i == j:
            continue
        d = o_relocate_cost(tour, D, i, j)
        if _accept(d, best_delta):
            best_delta, best_move = d, (i, j)
    if best_move is None:
        return 0.0, tour
    return best_delta, o_relocate(tour, *best_move)


def o_nearest_neighbor(W, depot=0):
    n = W.shape[0]
    tour = [depot]
    remaining = set(range(n)) - {depot}
    while remaining:
        cur = tour[-1]
        # first-minimum over ascending node order (G.neighbors order)
        nxt = min(sorted(remaining), key=lambda j: W[cur, j])
        tour.append(nxt)
        remaining.discard(nxt)
    tour.append(depot)
    return tour


def o_local_search(tour, cost, D):
    """algorithms.py:111-132 semantics; returns per-move cost trace too."""
    progress = []
    improved = True
    while improved:
        improved = False
        for op in (o_two_opt_a2a, o_relocate_a2a):
            delta, new_tour = op(tour, D)
            if delta < 0:
                improved = True
                cost += delta
                tour = new_tour
                progress.append(cost)
    return tour, cost, progress


def o_guided_local_search(D, guide, init_tour, n_iters, perturbation_moves=20):
    """algorithms.py:135-195 with the wall-clock loop replaced by n_iters.

    `guide` is a single (n, n) matrix (the common one-guide case).
    Returns (best_tour, best_cost, progress_costs).
    """
    n = D.shape[0]
    init_cost = o_tour_cost(D, init_tour)
    k = 0.1 * init_cost / n
    penalties = np.zeros_like(D)

    cur_tour, cur_cost, progress = o_local_search(list(init_tour), init_cost, D)
    best_tour, best_cost = cur_tour, cur_cost

    for _ in range(n_iters):
        moves = 0
        guard = 0
        while moves < perturbation_moves and guard < 3 * perturbation_moves:
            guard += 1
            # max-utility current-tour edge; first strict max wins
            max_util, max_e = None, None
            for a, b in zip(cur_tour[:-1], cur_tour[1:]):
                util = guide[a, b] / (1.0 + penalties[a, b])
                if max_e is None or util > max_util:
                    max_util, max_e = util, (a, b)
            u, v = max_e
            penalties[u, v] += 1.0
            penalties[v, u] += 1.0
            Dg = D + k * penalties

            for node in (u, v):
                if node == 0:
                    continue
                i = cur_tour.index(node)
                for op in (o_two_opt_o2a, o_relocate_o2a):
                    delta, new_tour = op(cur_tour, Dg, i)
                    if delta < 0:
                        cur_tour = new_tour
                        cur_cost = o_tour_cost(D, cur_tour)
                        progress.append(cur_cost)
                        moves += 1

        cur_tour, cur_cost, more = o_local_search(cur_tour, cur_cost, D)
        progress += more
        if cur_cost < best_cost:
            best_tour, best_cost = cur_tour, cur_cost

    return best_tour, best_cost, progress


def o_two_opt_a2a_first(tour, D):
    """First-improvement variant (operators.py first_improvement=True path)."""
    m = len(tour) - 1
    for i in range(1, m):
        for j in range(i + 1, m):
            if abs(i - j) < 2:
                continue
            d = o_two_opt_cost(tour, D, i, j)
            if _accept(d, 0.0):
                return d, o_two_opt(tour, i, j)
    return 0.0, tour


def o_relocate_a2a_first(tour, D):
    m = len(tour) - 1
    for i in range(1, m):
        for j in range(1, m):
            if i == j or i - j == 1:
                continue
            d = o_relocate_cost(tour, D, i, j)
            if _accept(d, 0.0):
                return d, o_relocate(tour, i, j)
    return 0.0, tour
