"""TSP solver oracles for label generation.

The reference shells out to two C solvers: Concorde for optimal tours
(gnngls/__init__.py:47-52) and LKH-3 for near-optimal tours through a forced
edge (gnngls/__init__.py:63-74, used per edge for regret labels,
gnngls/datasets.py:23-34).  Neither binary ships in this environment, so the
framework provides a tiered oracle:

  1. ``held_karp`` — exact bitmask DP, feasible to ~n=16.  Forced edges via an
     exact big-M reduction (subtract M from the forced edge; any tour using it
     beats any tour that doesn't, and M is added back).
  2. ``gls_oracle`` — our own TPU GLS at a large move budget, vmapped over
     many problems at once (e.g. all E forced-edge label solves of an
     instance in one batch).  Near-optimal, massively parallel; this replaces
     the per-edge LKH hot loop (SURVEY §3.1) with one device launch.
  3. ``concorde_tour`` / ``lkh_fixed_edge_tour`` — subprocess wrappers used
     automatically when the binaries exist on PATH (drop-in reference
     fidelity; label generation is host-side work either way).
"""

from __future__ import annotations

import functools
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

HELD_KARP_MAX_N = 16


def held_karp(D: np.ndarray) -> Tuple[list, float]:
    """Exact TSP via Held-Karp DP.  Returns (closed tour from 0, cost).

    O(2^n * n^2); intended for n <= HELD_KARP_MAX_N.
    """
    D = np.asarray(D, dtype=np.float64)
    n = D.shape[0]
    if n > HELD_KARP_MAX_N:
        raise ValueError(f"held_karp limited to n<={HELD_KARP_MAX_N}, got {n}")
    if n == 2:
        return [0, 1, 0], float(D[0, 1] * 2)
    m = n - 1  # cities 1..n-1
    full = 1 << m
    INF = np.inf
    dp = np.full((full, m), INF)
    parent = np.full((full, m), -1, dtype=np.int32)
    for j in range(m):
        dp[1 << j, j] = D[0, j + 1]
    Dsub = D[1:, 1:]  # (m, m)
    for mask in range(1, full):
        row = dp[mask]
        if not np.isfinite(row).any():
            continue
        js = np.flatnonzero(np.isfinite(row))
        # extend to every k not in mask
        ext = row[js, None] + Dsub[js, :]  # (|js|, m)
        arg = np.argmin(ext, axis=0)
        best = ext[arg, np.arange(m)]
        for k in range(m):
            if mask & (1 << k):
                continue
            nmask = mask | (1 << k)
            if best[k] < dp[nmask, k]:
                dp[nmask, k] = best[k]
                parent[nmask, k] = js[arg[k]]
    fullmask = full - 1
    tot = dp[fullmask] + D[1:, 0]
    j = int(np.argmin(tot))
    cost = float(tot[j])
    # reconstruct
    tour = [0]
    mask, cur = fullmask, j
    rev = []
    while cur != -1:
        rev.append(cur + 1)
        pj = parent[mask, cur]
        mask &= ~(1 << cur)
        cur = pj
    tour += rev[::-1] + [0]
    return tour, cost


def held_karp_fixed_edge(D: np.ndarray, e: Tuple[int, int]) -> Tuple[list, float]:
    """Exact optimal tour constrained to use edge e (big-M reduction)."""
    D = np.asarray(D, dtype=np.float64)
    M = D.sum() + 1.0
    D2 = D.copy()
    u, v = e
    D2[u, v] -= M
    D2[v, u] -= M
    tour, cost = held_karp(D2)
    return tour, float(cost + M)


# ---------------------------------------------------------------------------
# GLS-based near-optimal oracle (TPU, batched)


@functools.lru_cache(maxsize=32)
def _fixed_edge_solver(n: int, n_iters: int, perturbation_moves: int):
    """Compiled batched forced-edge GLS solver, cached per (n, budget).

    (A fresh jit closure per instance would recompile every call.)
    """
    import jax
    import jax.numpy as jnp

    from ..search import construct, local_search as ls

    def run(D2, Dtrue):
        def solve(Dr):
            init = construct.nearest_neighbor(Dr, 0)
            k = 0.1 * ls.mv.tour_cost(Dtrue, init) / n
            out = ls.guided_local_search(Dr, Dr[None], init, n_iters=n_iters,
                                         perturbation_moves=perturbation_moves,
                                         k=k)
            return out.best_cost, out.best_tour

        return jax.vmap(solve)(D2)

    return jax.jit(run)


def gls_oracle(Ds: np.ndarray, *, n_iters: int = 25, perturbation_moves: int = 30,
               seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Near-optimal tours for a batch of instances via our own GLS.

    Ds: (B, n, n).  Returns (tours (B, n+1) int32, costs (B,)).
    Weight-guided GLS from a nearest-neighbor start, large move budget.
    """
    import jax
    import jax.numpy as jnp

    from ..search import batched, construct, local_search as ls

    Ds = np.asarray(Ds, dtype=np.float32)

    # Prefer the whole-search Pallas kernel: ~5x (n=100) to ~14x (n=500)
    # the XLA engine's moves/s, and its n-scaled launch caps produce
    # bounded launches instead of one multi-minute vmapped fori_loop —
    # the known-fatal shape on the degraded worker (CRASH_ENVELOPE.md).
    if jax.default_backend() == "tpu":  # interpret mode would crawl on CPU
        try:
            inits = np.asarray(
                batched.nearest_neighbor_batch(jnp.asarray(Ds)))
            res = batched.run_fixed_pallas(
                Ds, Ds[:, None], inits, n_iters=n_iters,
                perturbation_moves=perturbation_moves)
            return res.best_tours.astype(np.int32), res.best_costs
        except Exception:  # noqa: BLE001 — kernel ceiling: XLA fallback
            pass

    def solve(D):
        init = construct.nearest_neighbor(D, 0)
        out = ls.guided_local_search(D, D[None], init, n_iters=n_iters,
                                     perturbation_moves=perturbation_moves)
        return out.best_tour, out.best_cost

    tours, costs = jax.jit(jax.vmap(solve))(jnp.asarray(Ds))
    return np.asarray(tours), np.asarray(costs)


def gls_fixed_edge_costs(D: np.ndarray, edges: np.ndarray, *, n_iters: int = 10,
                         perturbation_moves: int = 30, edge_chunk: int = 1024
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Near-optimal tour cost through each forced edge, one batch per instance.

    The reference solves one LKH run per edge (gnngls/datasets.py:30); here
    all E forced-edge problems of an instance run as a single vmapped batch.
    Forcing uses the exact big-M reduction; the returned costs are in the
    original metric (M added back).  The penalty scale k is computed from the
    *unreduced* initial cost so GLS dynamics stay sane on the reduced matrix.

    Returns (costs (E,), used (E,) bool — whether the forced edge is actually
    in the returned tour; callers should re-solve or fall back otherwise).
    """
    import jax.numpy as jnp

    D = np.asarray(D, dtype=np.float64)
    n = D.shape[0]
    M = float(D.sum() + 1.0)
    E = edges.shape[0]

    # Solve in fixed-width chunks (pad the tail by repeating edge 0): one
    # compiled width regardless of E, bounded device memory — a single
    # E-wide batch at n=100 (4950 problems) overruns HBM and kills the
    # worker; chunking also stays under wide-vmap miscompile territory.
    width = min(edge_chunk, E)
    solver = _fixed_edge_solver(n, n_iters, perturbation_moves)
    Dj = jnp.asarray(D, dtype=jnp.float32)

    costs = np.empty((E,), dtype=np.float64)
    used = np.empty((E,), dtype=bool)
    for s in range(0, E, width):
        idx = np.arange(s, min(s + width, E))
        pad = np.concatenate([idx, np.zeros(width - len(idx), dtype=np.int64)])
        ce = edges[pad]
        D2 = np.broadcast_to(D, (width,) + D.shape).copy()
        D2[np.arange(width), ce[:, 0], ce[:, 1]] -= M
        D2[np.arange(width), ce[:, 1], ce[:, 0]] -= M
        c, t = solver(jnp.asarray(D2, dtype=jnp.float32), Dj)
        t = np.asarray(t)[: len(idx)]
        a, b = t[:, :-1], t[:, 1:]
        ce = ce[: len(idx)]
        used[idx] = (((a == ce[:, :1]) & (b == ce[:, 1:2]))
                     | ((a == ce[:, 1:2]) & (b == ce[:, :1]))).any(axis=1)
        costs[idx] = np.asarray(c, dtype=np.float64)[: len(idx)] + M
    return costs, used


@functools.lru_cache(maxsize=32)
def _warm_forced_solver(n: int, n_gls_iters: int, perturbation_moves: int,
                        dual_splice: bool = False):
    """Compiled warm-start forced-edge solver, cached per (n, budget).

    Each lane solves one forced-edge problem: splice the edge into the
    best-known tour (one relocate), big-M reduce D so no improving move can
    ever drop the edge, then descend (local_search) and optionally run a few
    GLS iterations to escape the local minimum.  Starting near the
    constrained optimum makes each solve ~30-50x cheaper than the from-scratch
    GLS oracle while being *stronger* (the reference's per-edge LKH also
    starts from scratch, gnngls/datasets.py:30).

    dual_splice: also search from the v-BEFORE-u splice and keep the better
    result (2x work).  The two splices land in different local-search basins;
    the min fixes the rare stubborn edge where one basin is ~2% off.
    """
    import jax
    import jax.numpy as jnp

    from ..search import local_search as ls

    mv = ls.mv

    def splice(tour, u, v, before):
        # Make (u, v) adjacent in `tour` by relocating v next to u (after u,
        # or before u when `before`).  Canonical edges have u < v, so v != 0;
        # u may be the depot, which never moves.
        a, b = tour[:-1], tour[1:]
        contained = (((a == u) & (b == v)) | ((a == v) & (b == u))).any()
        pos_u = jnp.argmax(tour[:-1] == u).astype(jnp.int32)
        pos_v = jnp.argmax(tour[:-1] == v).astype(jnp.int32)
        # relocate semantics: pop position pos_v, element lands at final
        # index j (see moves.apply_relocate).
        if before:
            # v immediately before u (for u == 0: before the closing depot)
            j = jnp.where(u == 0, tour.shape[0] - 2,
                          jnp.where(pos_v > pos_u, pos_u, pos_u - 1))
        else:
            # v immediately after u
            j = jnp.where(u == 0, 1,
                          jnp.where(pos_v > pos_u, pos_u + 1, pos_u))
        return jnp.where(contained, tour, mv.apply_relocate(tour, pos_v, j))

    def run(D, M, edges, best_tour):
        def solve(e):
            u, v = e[0], e[1]
            eu = jax.nn.one_hot(u, n, dtype=D.dtype)
            ev = jax.nn.one_hot(v, n, dtype=D.dtype)
            D2 = D - M * (jnp.outer(eu, ev) + jnp.outer(ev, eu))
            k = 0.1 * mv.tour_cost(D, best_tour) / n

            def search_from(warm):
                cost0 = mv.tour_cost(D2, warm)
                res = ls.local_search(warm, cost0, D2, ls.make_trace(8))
                tour, cost = res.tour, res.cost
                if n_gls_iters > 0:
                    state = ls.GLSState(
                        tour=tour, cost=cost, best_tour=tour, best_cost=cost,
                        penalties=jnp.zeros_like(D), k=k,
                        iter_i=jnp.zeros((), jnp.int32), trace=res.trace)

                    def body(_, s):
                        return ls.gls_iteration(
                            s, D2, D2[None],
                            perturbation_moves=perturbation_moves)

                    state = jax.lax.fori_loop(0, n_gls_iters, body, state)
                    tour, cost = state.best_tour, state.best_cost
                return tour, cost

            tour, cost = search_from(splice(best_tour, u, v, before=False))
            if dual_splice:
                tour2, cost2 = search_from(splice(best_tour, u, v, before=True))
                tour = jnp.where(cost2 < cost, tour2, tour)
            return tour

        return jax.vmap(solve)(edges)

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _warm_forced_solver_binst(n: int, n_gls_iters: int,
                              perturbation_moves: int,
                              dual_splice: bool = False):
    """Instance-batched variant: one dispatch solves a whole instance GROUP.

    vmaps the per-instance warm solver over (D, M, best_tour) with the edge
    list shared.  Fewer, larger launches both utilize the chip better and
    sit in the safe region of the degraded axon worker's crash envelope
    (CRASH_ENVELOPE.md: many small back-to-back dispatches are the crash
    trigger; few large launches survive)."""
    import jax

    inner = _warm_forced_solver(n, n_gls_iters, perturbation_moves,
                                dual_splice)
    return jax.jit(jax.vmap(inner, in_axes=(0, 0, None, 0)))


def warm_fixed_edge_costs_batch(Ds: np.ndarray, edges: np.ndarray,
                                best_tours: np.ndarray, *,
                                n_gls_iters: int = 0,
                                perturbation_moves: int = 20,
                                dual_splice: bool = True,
                                inst_chunk: int = 4):
    """warm_fixed_edge_costs over a batch of instances, one dispatch per
    `inst_chunk` group (full edge set per instance in the launch).

    Returns (costs (B, E) f64, used (B, E) bool, tours (B, E, n+1) i32).
    HBM note: each lane materializes an (n, n) big-M matrix plus move-delta
    temporaries, ~0.5-1 GB per tsp100 instance transiently — inst_chunk=4-8
    fits a 16 GB v5e comfortably.
    """
    import jax.numpy as jnp

    Ds64 = np.asarray(Ds, dtype=np.float64)
    B, n, _ = Ds64.shape
    E = edges.shape[0]
    best_tours = np.asarray(best_tours, dtype=np.int32)
    solver = _warm_forced_solver_binst(n, n_gls_iters, perturbation_moves,
                                       dual_splice)
    ej = jnp.asarray(edges, jnp.int32)
    tours = np.empty((B, E, n + 1), dtype=np.int32)
    for s in range(0, B, inst_chunk):
        e = min(s + inst_chunk, B)
        pad = list(range(s, e)) + [s] * (inst_chunk - (e - s))
        Dj = jnp.asarray(Ds64[pad], dtype=jnp.float32)
        Ms = jnp.asarray(
            [float(n * Ds64[i].max() + 1.0) for i in pad], jnp.float32)
        btj = jnp.asarray(best_tours[pad])
        t = np.asarray(solver(Dj, Ms, ej, btj))
        tours[s:e] = t[: e - s]
    a, b = tours[..., :-1], tours[..., 1:]
    ii = np.arange(B)[:, None, None]
    costs = Ds64[ii, a, b].sum(axis=-1)
    eu, ev = edges[None, :, :1], edges[None, :, 1:2]
    used = (((a == eu) & (b == ev)) | ((a == ev) & (b == eu))).any(axis=-1)
    return costs, used, tours


def warm_fixed_edge_costs(D: np.ndarray, edges: np.ndarray,
                          best_tour: np.ndarray, *, n_gls_iters: int = 2,
                          perturbation_moves: int = 20,
                          edge_chunk: int = 2048, dual_splice: bool = False
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Near-optimal tour cost through each forced edge, warm-started.

    The production label oracle (reference semantics: one LKH solve per edge,
    gnngls/datasets.py:23-34).  Unlike :func:`gls_fixed_edge_costs` (GLS from
    a nearest-neighbor start), each lane starts from the best-known tour with
    the forced edge spliced in, so solves converge in tens of moves.  Big-M
    uses n*max(D)+1 (any tour through the edge beats any tour without it;
    ~40x smaller than sum(D), so far less f32 cancellation noise in move
    deltas).  Final costs are re-derived from the tours in f64 on the host —
    M never touches the reported numbers.

    Returns (costs (E,) f64, used (E,) bool, tours (E, n+1) i32).  `used` is
    guaranteed by construction (warm start contains the edge; dropping it
    costs +M, never improving) — returned for verification.
    """
    import jax.numpy as jnp

    D64 = np.asarray(D, dtype=np.float64)
    n = D64.shape[0]
    M = float(n * D64.max() + 1.0)
    E = edges.shape[0]
    best_tour = np.asarray(best_tour, dtype=np.int32)

    width = min(edge_chunk, E)
    solver = _warm_forced_solver(n, n_gls_iters, perturbation_moves,
                                 dual_splice)
    Dj = jnp.asarray(D64, dtype=jnp.float32)
    btj = jnp.asarray(best_tour)

    tours = np.empty((E, n + 1), dtype=np.int32)
    for s in range(0, E, width):
        idx = np.arange(s, min(s + width, E))
        pad = np.concatenate([idx, np.zeros(width - len(idx), dtype=np.int64)])
        t = solver(Dj, jnp.float32(M), jnp.asarray(edges[pad], jnp.int32), btj)
        tours[idx] = np.asarray(t)[: len(idx)]
    a, b = tours[:, :-1], tours[:, 1:]
    costs = D64[a, b].sum(axis=1)
    eu, ev = edges[:, :1], edges[:, 1:2]
    used = (((a == eu) & (b == ev)) | ((a == ev) & (b == eu))).any(axis=1)
    return costs, used, tours


# ---------------------------------------------------------------------------
# External C solvers (used when available; reference fidelity)


def has_concorde() -> bool:
    return shutil.which("concorde") is not None


def has_lkh(lkh_path: str = "LKH") -> bool:
    return shutil.which(lkh_path) is not None


def _write_tsplib(path: Path, coords: np.ndarray, scale: float,
                  fixed_edge: Optional[Sequence[int]] = None) -> None:
    n = coords.shape[0]
    with open(path, "w") as f:
        f.write("NAME: TSP\nTYPE: TSP\n")
        f.write(f"DIMENSION: {n}\nEDGE_WEIGHT_TYPE: EUC_2D\n")
        f.write("NODE_COORD_SECTION\n")
        for i, (x, y) in enumerate(coords):
            f.write(f"{i + 1} {x * scale:.0f} {y * scale:.0f}\n")
        if fixed_edge is not None:
            u, v = fixed_edge
            f.write(f"FIXED_EDGES_SECTION\n{u + 1} {v + 1}\n-1\n")
        f.write("EOF\n")


def concorde_tour(coords: np.ndarray, scale: float = 1e6) -> list:
    """Optimal tour via the Concorde binary (gnngls/__init__.py:47-52)."""
    if not has_concorde():
        raise RuntimeError("concorde binary not on PATH")
    with tempfile.TemporaryDirectory() as td:
        tsp = Path(td) / "p.tsp"
        _write_tsplib(tsp, coords, scale)
        sol = Path(td) / "p.sol"
        subprocess.run(["concorde", "-x", "-o", str(sol), str(tsp)],
                       cwd=td, check=True, capture_output=True)
        toks = sol.read_text().split()
        tour = [int(t) for t in toks[1:]]
    return tour + [0]


def lkh_fixed_edge_tour(coords: np.ndarray, e: Sequence[int], scale: float = 1e6,
                        lkh_path: str = "LKH", max_trials: int = 100,
                        runs: int = 10) -> list:
    """Near-optimal tour through edge e via the LKH-3 binary
    (gnngls/__init__.py:63-74; called with scale=1e6, max_trials=100, runs=10
    from gnngls/datasets.py:30)."""
    if not has_lkh(lkh_path):
        raise RuntimeError(f"{lkh_path} binary not on PATH")
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        _write_tsplib(td / "p.tsp", coords, scale, fixed_edge=e)
        tourf = td / "p.tour"
        (td / "p.par").write_text(
            f"PROBLEM_FILE = {td / 'p.tsp'}\nTOUR_FILE = {tourf}\n"
            f"MAX_TRIALS = {max_trials}\nRUNS = {runs}\nTRACE_LEVEL = 0\n")
        subprocess.run([lkh_path, str(td / "p.par")], check=True, capture_output=True)
        lines = tourf.read_text().splitlines()
        start = lines.index("TOUR_SECTION") + 1
        tour = []
        for ln in lines[start:]:
            val = int(ln.strip())
            if val == -1:
                break
            tour.append(val - 1)
    return tour + [0]
