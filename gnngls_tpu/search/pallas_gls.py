"""Whole-GLS Pallas kernel: the entire search loop resident in VMEM.

The XLA engine (search/local_search.py) runs GLS as a vmapped lax.while_loop
chain: hundreds of small sequential device ops per outer iteration, with
lockstep convergence across the batch.  This kernel instead runs the FULL
guided local search for one instance per grid cell — initial local search,
perturbation, re-optimization, best tracking — as one Pallas program whose
state never leaves VMEM:

  tour      (nt, 1) f32   (city ids are exact in f32 for any practical n)
  M         (nt, nt)      tour-space true weights   M[p,q] = D[t[p], t[q]]
  MPc       (n, n)        CITY-space penalties (reference: edge penalties)

State-maintenance design (v3 hybrid): penalties and guides are properties of
city pairs, invariant under tour permutations — so the authoritative copies
live in city space and are never permuted.  Only M is tour-space; after an
accepted move the tour row is permuted (one (nt,nt)x(nt,1) matmul), the
one-hot placement matrix P[p, c] = [tour[p] == c] is re-derived by a VPU
compare, and M is rebuilt exactly as P D P^T (two MXU matmuls of
0/1-selection operands — bit-exact, zero drift).  During PERTURBATION a
tour-space penalty cache MP = P MPc P^T rides along (rebuilt with M per
accepted move, bumped in lock-step with MPc), so the o2a guided scans read
rows of Mg = M + k*MP directly with VPU mask-reductions and rolls — v2
rematerialized guided rows from city space with one-hot matmuls per scan,
which measured 29% slower on hardware.

Multi-guide cycling (reference algorithms.py:147): the guides block is
(G, n, n); outer iteration it uses guide it % G, selected by masked sum —
city-space guides need no maintenance, so cycling costs nothing.

Per-outer-iteration traces: the packed output carries best_cost and
cumulative accepted-move snapshots after every outer iteration, so progress
DataFrames are per-iteration rather than final-only.

Semantics: identical accept rules to search/moves.py (EPS_CLOSE threshold,
best-improvement, reference iteration order), including the stale-endpoint-
position and utility-before-bump quirks.  In interpret mode move SEQUENCES
match the XLA engine exactly (accepts are delta-driven and deltas are exact
data movement; tests/test_pallas_gls.py pins move counts and costs).  One
documented divergence: the true cost recomputed after an accepted
perturbation move (reference quirk algorithms.py:176) sums the same f32 edge
values as moves.tour_cost but in XLA's reduction order for a different array
shape, which can differ by ~1 ulp — so when two iterations reach cost-TIED
best tours, the kernel may retain a different (equivalent-cost) best_tour
than the engine.  Search trajectories are unaffected (cost feeds only
best-tracking, never accept decisions); final costs are re-validated in f32
outside the kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .moves import EPS_CLOSE

# Tuning knobs (benchmarks/gls_tune.py A/Bs these on hardware; round-5
# measurements at tsp100/B=1024: highest+matmul 67.9k moves/s, +pltpu rolls
# 74.5k, +decomp3 dots 82.7k, +v3 hybrid perturbation 96.4k — all bit-exact
# vs the same seeded reference run):
#   GLS_DOT=decomp3 (default) data operand split into 3 exact bf16 terms,
#                   contracted with the bf16 0/1 selector -> 3 MXU passes
#                   instead of HIGHEST's 6; GLS_DOT=highest for the fallback.
#   GLS_ROLL=pltpu  (default) static-shift rolls as tpu.DynamicRotate (VPU)
#                   instead of permutation matmuls; GLS_ROLL=matmul fallback.
_DOT_MODE = os.environ.get("GLS_DOT", "decomp3")
_ROLL_MODE = os.environ.get("GLS_ROLL", "pltpu")

_BIG = 3.0e38
_BIGI = 1.0e9


def _iota2(nr, nc):
    # int32 iota then cast: Mosaic's tpu.iota is integer-only
    rr = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 0).astype(jnp.float32)
    cc = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 1).astype(jnp.float32)
    return rr, cc


def _first_min_scalar(vec_row):
    """(1, m) -> (min value, first index achieving it) as f32 scalars."""
    m = vec_row.shape[1]
    _, cc = _iota2(1, m)
    mn = jnp.min(vec_row)
    idx = jnp.min(jnp.where(vec_row == mn, cc, _BIGI))
    return mn, idx


def _first_max_scalar(vec_row):
    m = vec_row.shape[1]
    _, cc = _iota2(1, m)
    mx = jnp.max(vec_row)
    idx = jnp.min(jnp.where(vec_row == mx, cc, _BIGI))
    return mx, idx


def _first_min_2d(score):
    """(nr, nc) masked scores -> (min, row, col), first occurrence row-major."""
    nr, nc = score.shape
    rr, cc = _iota2(nr, nc)
    row_min = jnp.min(score, axis=1, keepdims=True)  # (nr, 1)
    col_idx = jnp.min(jnp.where(score == row_min, cc, _BIGI), axis=1,
                      keepdims=True)  # (nr, 1) first col of row min
    gmin = jnp.min(row_min)
    rsel = row_min[:, 0:1] == gmin
    rr1 = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0).astype(jnp.float32)
    row_idx = jnp.min(jnp.where(rsel, rr1, _BIGI))
    col_at = jnp.sum(jnp.where((rr1 == row_idx) & rsel, col_idx, 0.0))
    # col_at: if several rows tie at row_idx the mask picks exactly that row
    return gmin, row_idx, col_at


def _row_of(Mat, i):
    """Extract row i (f32 scalar index) of (nr, nc) as (1, nc), mask-reduce."""
    rr, _ = _iota2(*Mat.shape)
    return jnp.sum(jnp.where(rr == i, Mat, 0.0), axis=0, keepdims=True)


def _offdiag_row(Mat, offset):
    """(1, nt) with [0, q] = Mat[q + offset, q] (0 where out of range)."""
    rr, cc = _iota2(*Mat.shape)
    return jnp.sum(jnp.where(rr == cc + float(offset), Mat, 0.0), axis=0,
                   keepdims=True)


def _superdiag_row(Mat, offset=1):
    """(1, nt) with [0, q] = Mat[q, q+offset] (symmetric matrices only)."""
    rr, cc = _iota2(*Mat.shape)
    return jnp.sum(jnp.where(rr == cc + float(offset), Mat, 0.0), axis=0,
                   keepdims=True)


def _scalar_at(vec_row, idx):
    """vec_row (1, m), idx f32 scalar -> f32 scalar."""
    m = vec_row.shape[1]
    _, cc = _iota2(1, m)
    return jnp.sum(jnp.where(cc == idx, vec_row, 0.0))


_HI = jax.lax.Precision.HIGHEST


def _bdot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _split3(x):
    """Exact 3-term bf16 decomposition: x == h + m + l (f32 sums)."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _dot(a, b, onehot=None):
    """Exact f32 matmul for 0/1 selection operands.

    At HIGHEST precision the bf16x6 decomposition reconstructs each f32
    product 1.0*x exactly, so one-hot contractions are bit-exact data
    movement.  `onehot` marks which operand is the 0/1 selector: under
    GLS_DOT=decomp3 the data operand is manually split into 3 exact bf16
    terms and contracted with the bf16 selector (exact: 0/1 is one bf16
    term, and one-hot rows touch a single f32 value whose 3-term split
    re-sums exactly) — 3 MXU passes instead of HIGHEST's 6.  (Mosaic
    rejects per-operand precision, hence the manual split.)"""
    if _DOT_MODE == "decomp3" and onehot == "lhs":
        sel = a.astype(jnp.bfloat16)
        h, m, l = _split3(b)
        return _bdot(sel, h) + _bdot(sel, m) + _bdot(sel, l)
    if _DOT_MODE == "decomp3" and onehot == "rhs":
        sel = b.astype(jnp.bfloat16)
        h, m, l = _split3(a)
        return _bdot(h, sel) + _bdot(m, sel) + _bdot(l, sel)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), precision=_HI)


def _shift_mat(nt, shift):
    """(nt, nt) 0/1 matrix S with (x @ S)[i, q] = x[i, (q - shift) mod nt],
    i.e. jnp.roll(x, shift, axis=1).  Mosaic has no aligned-roll, so rolls
    become MXU permutation matmuls (exact, see _dot)."""
    rr, cc = _iota2(nt, nt)
    src = cc - float(shift)
    src = jnp.where(src < 0.0, src + nt, jnp.where(src >= nt, src - nt, src))
    return (rr == src).astype(jnp.float32)


def _roll_cols(x, shift):
    if _ROLL_MODE == "pltpu":
        return pltpu.roll(x, shift % x.shape[1], 1)
    return _dot(x, _shift_mat(x.shape[1], shift), onehot="rhs")


def _roll_rows(x, shift):
    if _ROLL_MODE == "pltpu":
        return pltpu.roll(x, shift % x.shape[0], 0)
    return _dot(jnp.transpose(_shift_mat(x.shape[0], shift)), x, onehot="lhs")


def _two_opt_src(i, j, nt):
    """(1, nt) src indices reversing positions [i, j-1]."""
    _, pp = _iota2(1, nt)
    in_seg = (pp >= i) & (pp < j)
    return jnp.where(in_seg, i + j - 1 - pp, pp)


def _relocate_src(i, j, nt):
    """(1, nt) src indices for pop(i)-insert(j)."""
    _, pp = _iota2(1, nt)
    src_lt = jnp.where(pp < i, pp, jnp.where(pp < j, pp + 1,
                                             jnp.where(pp == j, i, pp)))
    src_gt = jnp.where(pp < j, pp, jnp.where(pp == j, i,
                                             jnp.where(pp <= i, pp - 1, pp)))
    return jnp.where(i < j, src_lt, src_gt)


def _two_opt_a2a_delta(Mat):
    """Masked (nt, nt) 2-opt delta grid (garbage outside valid region)."""
    nt = Mat.shape[0]
    n = nt - 1
    shifted = _roll_cols(_roll_rows(Mat, 1), 1)  # [i,j] -> M[i-1,j-1] (wraps masked)
    rr, cc = _iota2(nt, nt)
    # c[j] = M[j, j-1] = M[j-1, j] (symmetry): sum_p M[p, q] (p == q - 1)
    c_row = jnp.sum(jnp.where(rr == cc - 1.0, Mat, 0.0), axis=0, keepdims=True)
    delta = Mat + shifted - jnp.transpose(c_row) - c_row
    valid = (rr >= 1.0) & (cc <= n - 1.0) & (cc - rr >= 2.0) & (delta < -EPS_CLOSE)
    return jnp.where(valid, delta, _BIG)


def _relocate_a2a_delta(Mat):
    nt = Mat.shape[0]
    n = nt - 1
    rr, cc = _iota2(nt, nt)
    d1_row = jnp.sum(jnp.where(rr == cc + 1.0, Mat, 0.0), axis=0, keepdims=True)
    # d1_row[0, q] = M[q+1, q] = M[q, q+1]
    d2_row = jnp.sum(jnp.where(rr == cc + 2.0, Mat, 0.0), axis=0, keepdims=True)
    # rem[i] = -M[i-1,i] - M[i,i+1] + M[i-1,i+1]
    rem_row = (-_roll_cols(d1_row, 1) - d1_row + _roll_cols(d2_row, 1))
    T = jnp.transpose(Mat)
    Mr = _roll_cols(Mat, -1)  # [i, j] -> M[i, j+1] (wrap masked)
    Tl = _roll_cols(T, 1)  # [i, j] -> M[j-1, i]
    ins_lt = -d1_row + T + Mr
    ins_gt = -_roll_cols(d1_row, 1) + Tl + Mat
    ins = jnp.where(rr < cc, ins_lt, ins_gt)
    delta = jnp.transpose(rem_row) + ins
    valid = ((rr >= 1.0) & (rr <= n - 1.0) & (cc >= 1.0) & (cc <= n - 1.0)
             & (rr != cc) & (rr - cc != 1.0) & (delta < -EPS_CLOSE))
    return jnp.where(valid, delta, _BIG)


def _gls_kernel(D_ref, G_ref, tour_ref, out_ref, *, n, n_guides, n_outer,
                pmoves, max_ls_iters, max_pert_iters):
    nt = n + 1
    D = D_ref[0]
    tour0 = tour_ref[0]  # (nt, 1) f32

    _, cols_n = _iota2(nt, n)

    def placement(tour):
        """One-hot P[p, c] = [tour[p] == c], pure VPU compare."""
        return (tour == cols_n).astype(jnp.float32)

    def build_M(tour):
        """M = P D P^T: exact 0/1-selection contractions (see _dot)."""
        P = placement(tour)
        return _dot(_dot(P, D, onehot="lhs"), jnp.transpose(P),
                    onehot="rhs")

    def apply_move(tour, src_row):
        """tour[p] <- tour[src[p]]; M rebuilt from scratch (no drift)."""
        rr, cc = _iota2(nt, nt)
        PM = (cc == jnp.transpose(src_row)).astype(jnp.float32)
        tour = _dot(PM, tour, onehot="lhs")
        return tour, build_M(tour)

    M0 = build_M(tour0)
    init_cost = jnp.sum(_superdiag_row(M0, 1)[:, :n])  # pre-LS cost
    k = 0.1 * init_cost / n  # algorithms.py:137

    # --- local search: best 2-opt then best relocate until no improvement ---
    def ls(state):
        tour, M, cost, moves = state

        def body(s):
            tour, M, cost, moves, _, it = s
            d1, i1, j1 = _first_min_2d(_two_opt_a2a_delta(M))
            f1 = d1 < -EPS_CLOSE
            src1 = jnp.where(f1, _two_opt_src(i1, j1, nt), _two_opt_src(0.0, 0.0, nt))
            tour, M = apply_move(tour, src1)
            cost = cost + jnp.where(f1, d1, 0.0)
            moves = moves + jnp.where(f1, 1.0, 0.0)

            d2, i2, j2 = _first_min_2d(_relocate_a2a_delta(M))
            f2 = d2 < -EPS_CLOSE
            src2 = jnp.where(f2, _relocate_src(i2, j2, nt), _two_opt_src(0.0, 0.0, nt))
            tour, M = apply_move(tour, src2)
            cost = cost + jnp.where(f2, d2, 0.0)
            moves = moves + jnp.where(f2, 1.0, 0.0)
            return tour, M, cost, moves, f1 | f2, it + 1

        def cond(s):
            return s[4] & (s[5] < max_ls_iters)

        out = jax.lax.while_loop(cond, body, (tour, M, cost, moves, True, 0))
        return out[:4]

    # --- guided rows from tour-space caches (v3 hybrid) ---------------------
    # Perturbation keeps a tour-space penalty cache MP = P MPc P^T alongside
    # the authoritative city-space MPc (which guide cycling needs).  o2a scans
    # then read Mg = M + k*MP rows directly (VPU mask-reductions + rolls, no
    # per-scan one-hot matmuls — the v2 guided-row rematerialization was the
    # measured 29% regression vs v1).  MP is rebuilt with M after each
    # accepted move (2 extra one-hot matmuls) and bumped in lock-step with
    # MPc (VPU outer products, covering the duplicated depot position).
    def tour_diag_row(tour, Cmat, offset):
        """(1, nt) row r with r[q] = Cmat[tour[q + offset], tour[q]].

        P_shift selects the offset cities; (P_shift @ Cmat) ⊙ P row-reduces to
        the tour-adjacent values of a city-space matrix (wrapped entries land
        only where callers' validity masks exclude them)."""
        P = placement(tour)
        Ps = placement(_roll_rows(tour, -offset))
        vals = jnp.sum(_dot(Ps, Cmat, onehot="lhs") * P, axis=1,
                       keepdims=True)  # (nt, 1)
        return jnp.transpose(vals)

    def build_T(tour, Cmat):
        """P Cmat P^T: tour-space view of a city-space matrix (exact)."""
        P = placement(tour)
        return _dot(_dot(P, Cmat, onehot="lhs"), jnp.transpose(P),
                    onehot="rhs")

    def apply_move_p(tour, src_row, MPc):
        """apply_move that also rebuilds the tour-space penalty cache."""
        rr, cc = _iota2(nt, nt)
        PM = (cc == jnp.transpose(src_row)).astype(jnp.float32)
        tour = _dot(PM, tour, onehot="lhs")
        return tour, build_M(tour), build_T(tour, MPc)

    def o2a_two_opt(Mg, i):
        """Best 2-opt with one endpoint at position i under guided weights."""
        _, jj = _iota2(1, nt)
        row_i = _row_of(Mg, i)
        row_im1 = _row_of(Mg, jnp.maximum(i - 1.0, 0.0))
        c_row = _offdiag_row(Mg, -1)  # c[q] = Mg[q-1, q]
        delta = row_i + _roll_cols(row_im1, 1) - _scalar_at(c_row, i) - c_row
        valid = ((jj >= 1.0) & (jj <= n - 1.0) & (jnp.abs(i - jj) >= 2.0)
                 & (delta < -EPS_CLOSE))
        d, j = _first_min_scalar(jnp.where(valid, delta, _BIG))
        return d, jnp.minimum(i, j), jnp.maximum(i, j)

    def o2a_relocate(Mg, i):
        _, jj = _iota2(1, nt)
        row_i = _row_of(Mg, i)
        d1_row = _offdiag_row(Mg, 1)   # d1[q] = Mg[q+1, q]
        d2_row = _offdiag_row(Mg, 2)   # d2[q] = Mg[q+2, q]
        rem_i = (-_scalar_at(_roll_cols(d1_row, 1), i) - _scalar_at(d1_row, i)
                 + _scalar_at(_roll_cols(d2_row, 1), i))
        ins_gt = -d1_row + row_i + _roll_cols(row_i, -1)  # j > i
        ins_lt = -_roll_cols(d1_row, 1) + _roll_cols(row_i, 1) + row_i  # j < i
        ins = jnp.where(jj > i, ins_gt, ins_lt)
        delta = rem_i + ins
        valid = (jj >= 1.0) & (jj <= n - 1.0) & (jj != i) & (delta < -EPS_CLOSE)
        d, j = _first_min_scalar(jnp.where(valid, delta, _BIG))
        return d, i, j

    def perturbation(state, Gm):
        def body(s):
            tour, M, MP, MPc, cost, moves, pmade, it = s
            # max-utility tour edge: guide/(1+penalty), penalties BEFORE bump
            g1 = tour_diag_row(tour, Gm, -1)   # g1[q] = Gm[t[q-1], t[q]] ...
            # ... shifted: we want guide of edge (t[q], t[q+1]) at q — use +1
            g1 = _roll_cols(g1, -1)            # g1[q] = Gm[t[q], t[q+1]]
            p1 = _superdiag_row(MP, 1)         # p1[q] = MP[q, q+1]
            _, qq = _iota2(1, nt)
            util = jnp.where(qq <= n - 1.0, g1 / (1.0 + p1), -_BIG)
            _, kk = _first_max_scalar(util)
            tr = jnp.transpose(tour)  # (1, nt)
            u = _scalar_at(tr, kk)
            v = _scalar_at(tr, kk + 1.0)
            # city-space penalty bump on edge (u, v): symmetric outer products
            rr_n, cc_n2 = _iota2(n, n)
            MPc = MPc + ((rr_n == u) & (cc_n2 == v)).astype(jnp.float32) \
                      + ((rr_n == v) & (cc_n2 == u)).astype(jnp.float32)
            # lock-step bump of the tour-space cache (masks catch the
            # duplicated depot position when u or v is city 0)
            mu = (tour == u).astype(jnp.float32)  # (nt, 1)
            mv = (tour == v).astype(jnp.float32)
            MP = MP + mu * jnp.transpose(mv) + mv * jnp.transpose(mu)

            def endpoint(node, tour, M, MP, cost, moves, pmade):
                active = node != 0.0
                pos = jnp.min(jnp.where(
                    jnp.transpose(tour) == node,
                    jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)
                    .astype(jnp.float32), _BIGI))
                d, lo, hi2 = o2a_two_opt(M + k * MP, pos)
                acc = active & (d < -EPS_CLOSE)
                src = jnp.where(acc, _two_opt_src(lo, hi2, nt),
                                _two_opt_src(0.0, 0.0, nt))
                tour, M, MP = apply_move_p(tour, src, MPc)
                cost = jnp.where(acc, jnp.sum(_superdiag_row(M, 1)[:, :n]), cost)
                moves = moves + jnp.where(acc, 1.0, 0.0)
                pmade = pmade + jnp.where(acc, 1.0, 0.0)

                # reference quirk: relocate reuses the pre-2-opt position
                d, i2, j2 = o2a_relocate(M + k * MP, pos)
                acc = active & (d < -EPS_CLOSE)
                src = jnp.where(acc, _relocate_src(i2, j2, nt),
                                _two_opt_src(0.0, 0.0, nt))
                tour, M, MP = apply_move_p(tour, src, MPc)
                cost = jnp.where(acc, jnp.sum(_superdiag_row(M, 1)[:, :n]), cost)
                moves = moves + jnp.where(acc, 1.0, 0.0)
                pmade = pmade + jnp.where(acc, 1.0, 0.0)
                return tour, M, MP, cost, moves, pmade

            tour, M, MP, cost, moves, pmade = endpoint(
                u, tour, M, MP, cost, moves, pmade)
            tour, M, MP, cost, moves, pmade = endpoint(
                v, tour, M, MP, cost, moves, pmade)
            return tour, M, MP, MPc, cost, moves, pmade, it + 1

        def cond(s):
            return (s[6] < pmoves) & (s[7] < max_pert_iters)

        tour, M, MPc, cost, moves = state
        MP0 = build_T(tour, MPc)
        out = jax.lax.while_loop(cond, body,
                                 (tour, M, MP0, MPc, cost, moves, 0.0, 0))
        return out[0], out[1], out[3], out[4], out[5]

    # --- run ---
    MPc0 = jnp.zeros((n, n), jnp.float32)
    tour, M, cost, moves = ls((tour0, M0, init_cost, 0.0))
    best_tour, best_cost = tour, cost

    trace_c0 = jnp.zeros((max(n_outer, 1), 1), jnp.float32)
    trace_m0 = jnp.zeros((max(n_outer, 1), 1), jnp.float32)
    rr_tr = jax.lax.broadcasted_iota(jnp.int32, (max(n_outer, 1), 1), 0) \
        .astype(jnp.float32)

    def outer(it, carry):
        tour, M, MPc, cost, moves, best_tour, best_cost, tr_c, tr_m = carry
        # guide cycling (algorithms.py:147): city-space guides are static,
        # selection is a masked sum over the G block
        if n_guides == 1:
            Gm = G_ref[0, 0]
        else:
            sel = (it % n_guides).astype(jnp.float32)
            Gm = sum(jnp.where(sel == float(g), G_ref[0, g],
                               jnp.zeros((n, n), jnp.float32))
                     for g in range(n_guides))
        tour, M, MPc, cost, moves = perturbation(
            (tour, M, MPc, cost, moves), Gm)
        tour, M, cost, moves = ls((tour, M, cost, moves))
        better = cost < best_cost
        best_tour = jnp.where(better, tour, best_tour)
        best_cost = jnp.where(better, cost, best_cost)
        it_f = it.astype(jnp.float32)
        tr_c = jnp.where(rr_tr == it_f, best_cost, tr_c)
        tr_m = jnp.where(rr_tr == it_f, moves, tr_m)
        return tour, M, MPc, cost, moves, best_tour, best_cost, tr_c, tr_m

    out = jax.lax.fori_loop(
        0, n_outer, outer,
        (tour, M, MPc0, cost, moves, best_tour, best_cost, trace_c0, trace_m0))
    best_tour, best_cost, moves = out[5], out[6], out[4]
    tr_c, tr_m = out[7], out[8]

    # packed output rows: [0, nt) best tour; nt best cost; nt+1 moves;
    # [nt+2, nt+2+n_outer) per-iteration best cost;
    # [nt+2+n_outer, nt+2+2*n_outer) per-iteration cumulative moves.
    # (per-grid-cell scalar outputs would violate the TPU block tiling rule;
    #  padding via selection matmuls — Mosaic rejects unaligned concatenate)
    n_tr = max(n_outer, 1)
    OUT = nt + 2 + 2 * n_tr
    rp, cp = _iota2(OUT, nt)
    padded = _dot((rp == cp).astype(jnp.float32), best_tour, onehot="lhs")
    rp_c, cp_c = _iota2(OUT, n_tr)
    pad_c = _dot((rp_c - float(nt + 2) == cp_c).astype(jnp.float32), tr_c,
                 onehot="lhs")
    pad_m = _dot((rp_c - float(nt + 2 + n_tr) == cp_c).astype(jnp.float32),
                 tr_m, onehot="lhs")
    rr1 = jax.lax.broadcasted_iota(jnp.int32, (OUT, 1), 0).astype(jnp.float32)
    out_col = jnp.where(rr1 < nt, padded,
                        jnp.where(rr1 == nt, best_cost,
                                  jnp.where(rr1 == nt + 1, moves,
                                            jnp.where(rr1 < nt + 2 + n_tr,
                                                      pad_c, pad_m))))
    out_ref[0] = out_col


@functools.partial(jax.jit, static_argnames=("n_iters", "perturbation_moves",
                                             "interpret"))
def gls_pallas(Ds, guides, init_tours, *, n_iters: int,
               perturbation_moves: int = 20, interpret: bool = False):
    """Fast-mode batched GLS, one VMEM-resident program per instance.

    Ds: (B, n, n) f32; guides: (B, n, n) or (B, G, n, n) f32 (cycled per
    outer iteration, reference algorithms.py:147); init_tours: (B, n+1) i32.
    Returns (best_tours (B, n+1) i32, best_costs (B,) f32, moves (B,) f32,
    trace_costs (B, n_iters) f32, trace_moves (B, n_iters) f32) where the
    traces snapshot best cost / cumulative accepted moves after each outer
    iteration.

    Note: the per-instance accepted-move counter accumulates in an f32 lane
    of the packed output row, so it is integer-exact only up to 2**24
    (~16.7M moves/instance).  A single GLS run is bounded well below that
    (n_iters * (10n + 6*perturbation_moves) accepts at the theoretical max);
    callers aggregating across runs should sum per-run counters host-side.
    """
    B, n, _ = Ds.shape
    nt = n + 1
    if guides.ndim == 3:
        guides = guides[:, None]
    G = guides.shape[1]
    tours_f = init_tours.astype(jnp.float32)[..., None]  # (B, nt, 1)

    kernel = functools.partial(
        _gls_kernel, n=n, n_guides=G, n_outer=n_iters,
        pmoves=float(perturbation_moves),
        max_ls_iters=10 * n, max_pert_iters=3 * perturbation_moves)

    n_tr = max(n_iters, 1)
    OUT = nt + 2 + 2 * n_tr
    # Large n needs more scoped VMEM than the 16 MB default (the live set is
    # ~20 (nt,nt) f32 matrices: n=500 wants 23.6 MB); v5e has far more
    # physical VMEM — raise the cap for the big-instance regime only.
    compiler_params = None
    if n >= 256 and not interpret:
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    packed = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, G, n, n), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, nt, 1), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, OUT, 1), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, OUT, 1), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(Ds, guides, tours_f)

    packed = packed[..., 0]
    return (packed[:, :nt].astype(jnp.int32), packed[:, nt], packed[:, nt + 1],
            packed[:, nt + 2:nt + 2 + n_tr][:, :n_iters],
            packed[:, nt + 2 + n_tr:][:, :n_iters])
