"""Fixed-shape 2-opt and relocate move operators.

TPU-native re-design of the reference's scalar move loops
(gnngls/operators.py).  Where the reference evaluates O(n^2) move deltas one
Python iteration at a time (operators.py:32-50,129-147), we build the full
(n+1, n+1) delta matrix with a handful of fused vector ops and take a masked
argmin — one XLA op chain per sweep, vmappable across thousands of instances.

Semantics preserved exactly (verified against a scalar oracle in tests):
  * tours are closed node arrays of length n+1: depot, ..., depot
    (reference tour lists, gnngls/__init__.py:9-21);
  * 2-opt delta  D[a,c] + D[b,d] - D[a,b] - D[c,d] with a=t[i], b=t[i-1],
    c=t[j], d=t[j-1]  (operators.py:14-29);
  * relocate delta, 6 terms, asymmetric in i<j / i>j  (operators.py:83-103);
  * candidate moves: indices in [1, n-1]; 2-opt requires |i-j| >= 2
    (operators.py:36-38); relocate all-to-all skips i-j == 1 (a duplicate
    swap, operators.py:134-135) while one-to-all skips only i == j
    (operators.py:112-113);
  * accept only strictly-improving moves that are not numerically ~0:
    `delta < best and not np.isclose(0, delta)` (operators.py:42) becomes a
    |delta| > EPS_CLOSE threshold;
  * ties between equal best deltas resolve to the first move in the
    reference's iteration order (row-major (i, j)) — argmin's first-occurrence
    rule reproduces this exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# np.isclose(0, delta) <=> |delta| <= atol + rtol*|delta|  (atol=1e-8, rtol=1e-5)
#                      <=> |delta| <= 1e-8 / (1 - 1e-5)
EPS_CLOSE = 1e-8 / (1.0 - 1e-5)

_INF = jnp.inf


def _pick(score, first_improvement: bool):
    """Flat index of the chosen candidate: most-negative (best-improvement,
    first occurrence on ties) or first valid in scan order (first-improvement,
    operators.py:44-45)."""
    flat = score.reshape(-1)
    if first_improvement:
        return jnp.argmax(jnp.isfinite(flat))
    return jnp.argmin(flat)


class Move(NamedTuple):
    delta: jax.Array  # f32 scalar, improvement (negative) or 0
    i: jax.Array  # i32 scalar
    j: jax.Array  # i32 scalar
    found: jax.Array  # bool scalar


def _tour_matrix(D: jax.Array, tour: jax.Array) -> jax.Array:
    """M[p, q] = D[tour[p], tour[q]], shape (n+1, n+1).

    TPU note: built as two chained single-axis takes.  A fused 2-D advanced
    index ``D[tour[:, None], tour[None, :]]`` lowers to a scalar gather loop
    on TPU (~300x slower, measured); per-axis takes lower to fast vector
    gathers and extract values exactly (unlike a one-hot matmul, which would
    round through bf16 on the MXU and break trajectory parity)."""
    return jnp.take(jnp.take(D, tour, axis=0), tour, axis=1)


def tour_cost(D: jax.Array, tour: jax.Array) -> jax.Array:
    """Closed-tour cost: sum of D over consecutive pairs."""
    return jnp.diagonal(_tour_matrix(D, tour), offset=1).sum()


def pair_values(A: jax.Array, tour: jax.Array) -> jax.Array:
    """A[tour[p], tour[p+1]] for consecutive tour pairs, shape (n,)."""
    return jnp.diagonal(_tour_matrix(A, tour), offset=1)


def _position_grids(nt: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 1)
    return ii, jj


# ---------------------------------------------------------------------------
# 2-opt


def _two_opt_delta_matrix(M: jax.Array) -> jax.Array:
    """delta[i, j] = M[i,j] + M[i-1,j-1] - M[i,i-1] - M[j,j-1] (valid i,j >= 1)."""
    nt = M.shape[0]
    shifted = jnp.pad(M[:-1, :-1], ((1, 0), (1, 0)))
    c = jnp.concatenate([jnp.zeros((1,), M.dtype), jnp.diagonal(M, offset=-1)])
    return M + shifted - c[:, None] - c[None, :]


def two_opt_a2a(tour: jax.Array, D: jax.Array,
                first_improvement: bool = False) -> Move:
    """Best improving 2-opt move over all (i, j).  operators.py:32-50."""
    nt = tour.shape[0]
    n = nt - 1
    M = _tour_matrix(D, tour)
    delta = _two_opt_delta_matrix(M)
    ii, jj = _position_grids(nt)
    valid = (ii >= 1) & (jj <= n - 1) & (jj - ii >= 2) & (delta < -EPS_CLOSE)
    score = jnp.where(valid, delta, _INF)
    k = _pick(score, first_improvement)
    best = score.reshape(-1)[k]
    found = jnp.isfinite(best)
    return Move(jnp.where(found, best, 0.0), (k // nt).astype(jnp.int32),
                (k % nt).astype(jnp.int32), found)


def two_opt_o2a(tour: jax.Array, D: jax.Array, i: jax.Array,
                first_improvement: bool = False) -> Move:
    """Best improving 2-opt move with one endpoint fixed at position i.

    operators.py:53-73 — j sweeps [1, n-1]; the delta helper symmetrizes
    (i, j), so j on either side of i is considered.  Because D (hence M) is
    symmetric, delta[j] = M[i,j] + M[i-1,j-1] - c[i] - c[j] for either order,
    so only two rows of M are touched (no 2-D index gathers).
    """
    nt = tour.shape[0]
    n = nt - 1
    M = _tour_matrix(D, tour)
    c = jnp.concatenate([jnp.zeros((1,), M.dtype), jnp.diagonal(M, offset=-1)])
    jv = jnp.arange(nt, dtype=jnp.int32)
    row_i = jnp.take(M, i, axis=0)
    row_im1 = jnp.take(M, jnp.maximum(i - 1, 0), axis=0)
    row_im1_shift = jnp.concatenate([row_im1[:1], row_im1[:-1]])  # [j] -> M[i-1, j-1]
    delta = row_i + row_im1_shift - c[i] - c
    valid = (jv >= 1) & (jv <= n - 1) & (jnp.abs(i - jv) >= 2) & (delta < -EPS_CLOSE)
    score = jnp.where(valid, delta, _INF)
    j = _pick(score, first_improvement)
    best = score[j]
    found = jnp.isfinite(best)
    return Move(jnp.where(found, best, 0.0), jnp.minimum(i, j).astype(jnp.int32),
                jnp.maximum(i, j).astype(jnp.int32), found)


def apply_two_opt(tour: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    """Reverse tour positions [i, j-1] (requires i < j).  operators.py:6-11."""
    nt = tour.shape[0]
    p = jnp.arange(nt, dtype=jnp.int32)
    src = jnp.where((p >= i) & (p < j), i + j - 1 - p, p)
    return tour[src]


# ---------------------------------------------------------------------------
# relocate


def _relocate_delta_matrix(M: jax.Array) -> jax.Array:
    """delta[i, j] of moving the city at position i to position j.

    operators.py:83-103:
      removal(i) = -M[i-1,i] - M[i,i+1] + M[i-1,i+1]
      insertion(i, j) = i<j: -M[j,j+1] + M[j,i] + M[i,j+1]
                        i>j: -M[j-1,j] + M[j-1,i] + M[i,j]
    Entries outside the valid band contain garbage; callers mask.
    """
    nt = M.shape[0]
    d1 = jnp.diagonal(M, offset=1)  # d1[k] = M[k, k+1]
    d2 = jnp.diagonal(M, offset=2)  # d2[k] = M[k, k+2]
    pad1 = jnp.concatenate([d1, jnp.zeros((1,), M.dtype)])  # pad1[k] = M[k,k+1], k<=n-1
    rem = (-jnp.concatenate([jnp.zeros((1,), M.dtype), d1])  # -M[i-1,i]
           - pad1  # -M[i,i+1]
           + jnp.concatenate([jnp.zeros((1,), M.dtype), d2, jnp.zeros((1,), M.dtype)])[:nt])
    # rem[i] = -M[i-1,i] - M[i,i+1] + M[i-1,i+1], valid for 1 <= i <= n-1

    # Insertion terms re-expressed as shifts of M (2-D index-grid gathers are
    # pathologically slow on TPU; see _tour_matrix).  With T = M^T:
    #   i<j: -d1[j]   + M[j,i]   + M[i,j+1]  = -pad1[j]   + T[i,j]   + Mr[i,j]
    #   i>j: -d1[j-1] + M[j-1,i] + M[i,j]    = -pad1[j-1] + Tl[i,j]  + M[i,j]
    # where Mr[i,j] = M[i,j+1] (shift left, clamp last) and
    #       Tl[i,j] = T[i,j-1] (shift right, clamp first).
    ii, jj = _position_grids(nt)
    T = M.T
    Mr = jnp.concatenate([M[:, 1:], M[:, -1:]], axis=1)
    Tl = jnp.concatenate([T[:, :1], T[:, :-1]], axis=1)
    pad1_lt = pad1[None, :]
    pad1_gt = jnp.concatenate([pad1[:1], pad1[:-1]])[None, :]
    ins_lt = -pad1_lt + T + Mr
    ins_gt = -pad1_gt + Tl + M
    ins = jnp.where(ii < jj, ins_lt, ins_gt)
    return rem[:, None] + ins


def relocate_a2a(tour: jax.Array, D: jax.Array,
                 first_improvement: bool = False) -> Move:
    """Best improving relocate over all ordered (i, j), skipping i-j == 1.

    operators.py:129-147.
    """
    nt = tour.shape[0]
    n = nt - 1
    M = _tour_matrix(D, tour)
    delta = _relocate_delta_matrix(M)
    ii, jj = _position_grids(nt)
    valid = ((ii >= 1) & (ii <= n - 1) & (jj >= 1) & (jj <= n - 1)
             & (ii != jj) & (ii - jj != 1) & (delta < -EPS_CLOSE))
    score = jnp.where(valid, delta, _INF)
    k = _pick(score, first_improvement)
    best = score.reshape(-1)[k]
    found = jnp.isfinite(best)
    return Move(jnp.where(found, best, 0.0), (k // nt).astype(jnp.int32),
                (k % nt).astype(jnp.int32), found)


def relocate_o2a(tour: jax.Array, D: jax.Array, i: jax.Array,
                 first_improvement: bool = False) -> Move:
    """Best improving relocate of the city at position i (skips only i == j).

    operators.py:106-126 — note i-j == 1 is NOT skipped here, matching the
    reference's one-to-all variant.
    """
    nt = tour.shape[0]
    n = nt - 1
    M = _tour_matrix(D, tour)
    delta_row = _relocate_delta_matrix(M)[i]
    jv = jnp.arange(nt, dtype=jnp.int32)
    valid = (jv >= 1) & (jv <= n - 1) & (jv != i) & (delta_row < -EPS_CLOSE)
    score = jnp.where(valid, delta_row, _INF)
    j = _pick(score, first_improvement)
    best = score[j]
    found = jnp.isfinite(best)
    return Move(jnp.where(found, best, 0.0), i.astype(jnp.int32), j.astype(jnp.int32), found)


def apply_relocate(tour: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    """Pop position i, insert at position j.  operators.py:76-80."""
    nt = tour.shape[0]
    p = jnp.arange(nt, dtype=jnp.int32)
    src_lt = jnp.where(p < i, p, jnp.where(p < j, p + 1, jnp.where(p == j, i, p)))
    src_gt = jnp.where(p < j, p, jnp.where(p == j, i, jnp.where(p <= i, p - 1, p)))
    src = jnp.where(i < j, src_lt, src_gt)
    return tour[jnp.clip(src, 0, nt - 1)]
