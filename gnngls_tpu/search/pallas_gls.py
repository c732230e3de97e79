"""Whole-GLS Pallas kernel: the entire search loop resident in VMEM.

The XLA engine (search/local_search.py) runs GLS as a vmapped lax.while_loop
chain: hundreds of small sequential device ops per outer iteration, with
lockstep convergence across the batch.  This kernel instead runs the FULL
guided local search for one instance per grid cell — initial local search,
perturbation, re-optimization, best tracking — as one Pallas program whose
state never leaves VMEM:

  tour      (nt, 1) f32   (city ids are exact in f32 for any practical n)
  M         (nt, nt)      tour-space true weights   M[p,q] = D[t[p], t[q]]
  MG        (nt, nt)      tour-space guide values
  MP        (nt, nt)      tour-space penalties

M/MG/MP are built once (one-hot matmuls at HIGHEST precision) and then
*maintained* under every accepted move by applying the move's position
permutation with exact VPU mask-reductions — weights are moved, never
recomputed, so there is no gather, no rebuild, and no drift.  All reductions,
argmins (first-occurrence tie-break, matching the reference's scan order),
one-hot comparisons and shifts are 2-D/3-D VPU ops; the only MXU use is the
initial build.

Semantics: identical accept rules to search/moves.py (EPS_CLOSE threshold,
best-improvement, reference iteration order).  In interpret mode trajectories
match the XLA engine exactly; on TPU hardware the initial HIGHEST-precision
extraction can differ from f32 gathers by ~1 ulp, which may flip near-tie
decisions — this is the documented "fast mode" of the framework (final costs
are re-validated in f32 outside the kernel).

Limitations (fall back to the XLA engine otherwise): one guide matrix
(the shipped pipeline's configuration), no per-move trace buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .moves import EPS_CLOSE

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
    """Extract row i (f32 scalar index) of (nt, nt) as (1, nt), mask-reduce."""
    nt = Mat.shape[0]
    rr, _ = _iota2(nt, nt)
    return jnp.sum(jnp.where(rr == i, Mat, 0.0), axis=0, keepdims=True)


def _superdiag_row(Mat, offset=1):
    """(1, nt) with [0, q] = Mat[q, q+offset] (symmetric matrices only)."""
    nt = Mat.shape[0]
    rr, cc = _iota2(nt, nt)
    return jnp.sum(jnp.where(rr == cc + offset, Mat, 0.0), axis=0, keepdims=True)


def _scalar_at(vec_row, idx):
    """vec_row (1, m), idx f32 scalar -> f32 scalar."""
    m = vec_row.shape[1]
    _, cc = _iota2(1, m)
    return jnp.sum(jnp.where(cc == idx, vec_row, 0.0))


_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    """Exact f32 matmul for 0/1 permutation operands.

    At HIGHEST precision the bf16x3 decomposition reconstructs each f32
    product 1.0*x exactly, so permutation matmuls are bit-exact."""
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
    return _dot(x, _shift_mat(x.shape[1], shift))


def _roll_rows(x, shift):
    return _dot(jnp.transpose(_shift_mat(x.shape[0], shift)), x)


def _permute_all(tour, M, MG, MP, src_row):
    """Apply position permutation p -> src[p] to the tour and all matrices.

    src_row: (1, nt) f32 source indices.  new[p] = old[src[p]].
    Exact data movement via 0/1 mask multiply-reduce (VPU only).
    """
    nt = M.shape[0]
    rr, cc = _iota2(nt, nt)
    PM = (cc == jnp.transpose(src_row)).astype(jnp.float32)  # (nt_p, nt_r)

    tour_new = _dot(PM, tour)

    def perm(A):
        # B = PM A PM^T on the MXU (exact for permutation operands, see _dot)
        return _dot(_dot(PM, A), jnp.transpose(PM))

    return tour_new, perm(M), perm(MG), perm(MP)


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
    c_row = _superdiag_row(Mat, 1)  # c[j] = M[j, j+1] ... careful: need M[j, j-1]
    # c[j] = M[j, j-1] = M[j-1, j] (symmetry) = superdiag at offset -1 of row j:
    # using rr == cc - 1 mask: sum_p M[p, q] (p == q - 1) = M[q-1, q] ✓
    rr, cc = _iota2(nt, nt)
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


def _gls_kernel(D_ref, G_ref, tour_ref, out_ref, *, n, n_outer, pmoves,
                max_ls_iters, max_pert_iters):
    nt = n + 1
    D = D_ref[0]
    G = G_ref[0]
    tour0 = tour_ref[0]  # (nt, 1) f32

    # --- initial build: one-hot P, then M = P D P^T (HIGHEST = near-f32) ---
    _, cols_n = _iota2(nt, n)
    P = (tour0 == cols_n).astype(jnp.float32)  # (nt, n)
    hi = jax.lax.Precision.HIGHEST

    def build(A):
        PA = jax.lax.dot_general(P, A, (((1,), (0,)), ((), ())), precision=hi)
        return jax.lax.dot_general(PA, P, (((1,), (1,)), ((), ())), precision=hi)

    M0 = build(D)
    MG0 = build(G)
    MP0 = jnp.zeros((nt, nt), jnp.float32)

    init_cost = jnp.sum(_superdiag_row(M0, 1)[:, :n])  # pre-LS cost
    k = 0.1 * init_cost / n  # algorithms.py:137

    # --- local search: best 2-opt then best relocate until no improvement ---
    def ls(state):
        tour, M, MG, MP, cost, moves = state

        def body(s):
            tour, M, MG, MP, cost, moves, _, it = s
            d1, i1, j1 = _first_min_2d(_two_opt_a2a_delta(M))
            f1 = d1 < -EPS_CLOSE
            src1 = jnp.where(f1, _two_opt_src(i1, j1, nt), _two_opt_src(0.0, 0.0, nt))
            tour, M, MG, MP = _permute_all(tour, M, MG, MP, src1)
            cost = cost + jnp.where(f1, d1, 0.0)
            moves = moves + jnp.where(f1, 1.0, 0.0)

            d2, i2, j2 = _first_min_2d(_relocate_a2a_delta(M))
            f2 = d2 < -EPS_CLOSE
            src2 = jnp.where(f2, _relocate_src(i2, j2, nt), _two_opt_src(0.0, 0.0, nt))
            tour, M, MG, MP = _permute_all(tour, M, MG, MP, src2)
            cost = cost + jnp.where(f2, d2, 0.0)
            moves = moves + jnp.where(f2, 1.0, 0.0)
            return tour, M, MG, MP, cost, moves, f1 | f2, it + 1

        def cond(s):
            return s[6] & (s[7] < max_ls_iters)

        out = jax.lax.while_loop(cond, body,
                                 (tour, M, MG, MP, cost, moves, True, 0))
        return out[:6]

    def o2a_two_opt(Mg, i):
        """Best 2-opt with one endpoint at position i: (delta, lo, hi)."""
        _, jj = _iota2(1, nt)
        row_i = _row_of(Mg, i)
        row_im1 = _row_of(Mg, jnp.maximum(i - 1.0, 0.0))
        rr2, cc2 = _iota2(nt, nt)
        c_row = jnp.sum(jnp.where(rr2 == cc2 - 1.0, Mg, 0.0), axis=0, keepdims=True)
        delta = row_i + _roll_cols(row_im1, 1) - _scalar_at(c_row, i) - c_row
        valid = ((jj >= 1.0) & (jj <= n - 1.0) & (jnp.abs(i - jj) >= 2.0)
                 & (delta < -EPS_CLOSE))
        d, j = _first_min_scalar(jnp.where(valid, delta, _BIG))
        return d, jnp.minimum(i, j), jnp.maximum(i, j)

    def o2a_relocate(Mg, i):
        _, jj = _iota2(1, nt)
        rr2, cc2 = _iota2(nt, nt)
        d1_row = jnp.sum(jnp.where(rr2 == cc2 + 1.0, Mg, 0.0), axis=0, keepdims=True)
        d2_row = jnp.sum(jnp.where(rr2 == cc2 + 2.0, Mg, 0.0), axis=0, keepdims=True)
        row_i = _row_of(Mg, i)
        rem_i = (-_scalar_at(_roll_cols(d1_row, 1), i) - _scalar_at(d1_row, i)
                 + _scalar_at(_roll_cols(d2_row, 1), i))
        ins_gt = -d1_row + row_i + _roll_cols(row_i, -1)  # j > i
        ins_lt = -_roll_cols(d1_row, 1) + _roll_cols(row_i, 1) + row_i  # j < i
        ins = jnp.where(jj > i, ins_gt, ins_lt)
        delta = rem_i + ins
        valid = (jj >= 1.0) & (jj <= n - 1.0) & (jj != i) & (delta < -EPS_CLOSE)
        d, j = _first_min_scalar(jnp.where(valid, delta, _BIG))
        return d, i, j

    def perturbation(state):
        def body(s):
            tour, M, MG, MP, cost, moves, pmade, it = s
            # max-utility tour edge: guide/(1+penalty) over positions 0..n-1
            g1 = _superdiag_row(MG, 1)
            p1 = _superdiag_row(MP, 1)
            _, qq = _iota2(1, nt)
            util = jnp.where(qq <= n - 1.0, g1 / (1.0 + p1), -_BIG)
            _, kk = _first_max_scalar(util)
            tr = jnp.transpose(tour)  # (1, nt)
            u = _scalar_at(tr, kk)
            v = _scalar_at(tr, kk + 1.0)
            # penalty bump on every position pair mapping to (u, v)
            mu = (tour == u).astype(jnp.float32)  # (nt, 1)
            mv = (tour == v).astype(jnp.float32)
            MP = MP + mu * jnp.transpose(mv) + mv * jnp.transpose(mu)

            def endpoint(node, tour, M, MG, MP, cost, moves, pmade):
                active = node != 0.0
                pos = jnp.min(jnp.where(
                    jnp.transpose(tour) == node,
                    jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)
                    .astype(jnp.float32), _BIGI))
                Mg = M + k * MP
                d, lo, hi2 = o2a_two_opt(Mg, pos)
                acc = active & (d < -EPS_CLOSE)
                src = jnp.where(acc, _two_opt_src(lo, hi2, nt),
                                _two_opt_src(0.0, 0.0, nt))
                tour, M, MG, MP = _permute_all(tour, M, MG, MP, src)
                cost = jnp.where(acc, jnp.sum(_superdiag_row(M, 1)[:, :n]), cost)
                moves = moves + jnp.where(acc, 1.0, 0.0)
                pmade = pmade + jnp.where(acc, 1.0, 0.0)

                Mg = M + k * MP
                d, i2, j2 = o2a_relocate(Mg, pos)
                acc = active & (d < -EPS_CLOSE)
                src = jnp.where(acc, _relocate_src(i2, j2, nt),
                                _two_opt_src(0.0, 0.0, nt))
                tour, M, MG, MP = _permute_all(tour, M, MG, MP, src)
                cost = jnp.where(acc, jnp.sum(_superdiag_row(M, 1)[:, :n]), cost)
                moves = moves + jnp.where(acc, 1.0, 0.0)
                pmade = pmade + jnp.where(acc, 1.0, 0.0)
                return tour, M, MG, MP, cost, moves, pmade

            tour, M, MG, MP, cost, moves, pmade = endpoint(
                u, tour, M, MG, MP, cost, moves, pmade)
            tour, M, MG, MP, cost, moves, pmade = endpoint(
                v, tour, M, MG, MP, cost, moves, pmade)
            return tour, M, MG, MP, cost, moves, pmade, it + 1

        def cond(s):
            return (s[6] < pmoves) & (s[7] < max_pert_iters)

        tour, M, MG, MP, cost, moves = state
        out = jax.lax.while_loop(cond, body,
                                 (tour, M, MG, MP, cost, moves, 0.0, 0))
        return out[:6]

    # --- run ---
    state = ls((tour0, M0, MG0, MP0, init_cost, 0.0))
    tour, M, MG, MP, cost, moves = state
    best_tour, best_cost = tour, cost

    def outer(_, carry):
        tour, M, MG, MP, cost, moves, best_tour, best_cost = carry
        tour, M, MG, MP, cost, moves = perturbation((tour, M, MG, MP, cost, moves))
        tour, M, MG, MP, cost, moves = ls((tour, M, MG, MP, cost, moves))
        better = cost < best_cost
        best_tour = jnp.where(better, tour, best_tour)
        best_cost = jnp.where(better, cost, best_cost)
        return tour, M, MG, MP, cost, moves, best_tour, best_cost

    out = jax.lax.fori_loop(0, n_outer, outer,
                            (tour, M, MG, MP, cost, moves, best_tour, best_cost))
    # packed output rows: [0, nt) = best tour, nt = best cost, nt+1 = moves
    # (per-grid-cell scalar outputs would violate the TPU block tiling rule;
    #  padding via selection matmul — Mosaic rejects unaligned concatenate)
    rp, cp = _iota2(nt + 2, nt)
    padded = _dot((rp == cp).astype(jnp.float32), out[6])
    rr1 = jax.lax.broadcasted_iota(jnp.int32, (nt + 2, 1), 0).astype(jnp.float32)
    out_ref[0] = jnp.where(rr1 < nt, padded,
                           jnp.where(rr1 == nt, out[7], out[5]))


@functools.partial(jax.jit, static_argnames=("n_iters", "perturbation_moves",
                                             "interpret"))
def gls_pallas(Ds, guides, init_tours, *, n_iters: int,
               perturbation_moves: int = 20, interpret: bool = False):
    """Fast-mode batched GLS, one VMEM-resident program per instance.

    Ds, guides: (B, n, n) f32; init_tours: (B, n+1) int32.
    Returns (best_tours (B, n+1) i32, best_costs (B,) f32, moves (B,) f32).

    Note: the per-instance accepted-move counter accumulates in an f32 lane
    of the packed output row, so it is integer-exact only up to 2**24
    (~16.7M moves/instance).  A single GLS run is bounded well below that
    (n_iters * (10n + 6*perturbation_moves) accepts at the theoretical max);
    callers aggregating across runs should sum per-run counters host-side.
    """
    B, n, _ = Ds.shape
    nt = n + 1
    tours_f = init_tours.astype(jnp.float32)[..., None]  # (B, nt, 1)

    kernel = functools.partial(
        _gls_kernel, n=n, n_outer=n_iters, pmoves=float(perturbation_moves),
        max_ls_iters=10 * n, max_pert_iters=3 * perturbation_moves)

    packed = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nt, 1), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nt + 2, 1), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nt + 2, 1), jnp.float32),
        interpret=interpret,
    )(Ds, guides, tours_f)

    packed = packed[..., 0]
    return (packed[:, :nt].astype(jnp.int32), packed[:, nt], packed[:, nt + 1])
