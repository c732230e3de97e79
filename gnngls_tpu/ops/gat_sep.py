"""Separable GAT: rank-1 score decomposition, O(n^2) memory, no score tensor.

The bottleneck of every other GAT path in this framework (and of the DGL CUDA
kernels they replace, gnngls/models.py:22-24) is the per-group score tensor
``s[u, i, j] = leaky_relu(el[S_u[j]] + er[S_u[i]])`` — (B, n, n-1, n-1, H)
elements (10e9 at tsp100/B=128) whose HBM round-trips and VPU exp work bound
the forward at ~10% MFU regardless of dtype (benchmarks/RESULTS_north_star.md).

This module removes that tensor algebraically.  GAT scores are *rank-1
structured*: s_ij = leaky(el_j + er_i) with slope a.  Split on the sign of
x = el_j + er_i:

  exp(leaky(x)) = exp(x)      = exp(el_j) * exp(er_i)        if x > 0
                  exp(a * x)  = exp(a*el_j) * exp(a*er_i)    if x <= 0

and x > 0  <=>  el_j > -er_i.  So for each destination i the softmax
denominator and numerator over its group split into two *separable* partial
sums over a threshold in el:

  z_i   = B_i * sum_{el_j > -er_i} A_j      + D_i * sum_{el_j <= -er_i} C_j
  num_i = B_i * sum_{el_j > -er_i} A_j h_j  + D_i * sum_{el_j <= -er_i} C_j h_j

with A_j = exp(el_j - M), C_j = exp(a*(el_j - M)), B_i = exp(er_i + M - m_i),
D_i = exp(a*(er_i + M) - m_i), M = max_j el_j.  Sort each group's el once
(K = n-1 keys), take prefix sums of the sorted payloads, and every row i is a
binary search + one prefix-row gather: O(K log K) per group instead of O(K^2).
Per-group work drops from O(n^3) score elements to O(n^2 * F) payload elements
— the same asymptotics as the model's dense layers.

Numerical-stability invariants (all hold whenever i != argmax el):
  * m_i = leaky(max_{j != i} el_j + er_i) is the exact row max (leaky is
    monotone), so every reconstructed term exp(s_ij - m_i) <= 1;
  * A_j, C_j <= 1 and B_i, D_i <= 1, so products neither overflow nor lose
    mass to underflow (dropped terms are < 1e-38 against z_i >= 1);
  * self-exclusion is a *linear-domain* subtraction of A_i (<= 1) from a sum
    that also contains the row-max term (= 1), so cancellation is bounded by
    one ulp of 1 — unlike exp-domain subtraction, which is catastrophic when
    the self score dominates (see ops/gat.py self_mask note).
The single row i = argmax el per (group, head) violates the B_i <= 1 bound
(its off-self max M2 can sit far below M); that one row per group is computed
directly in O(K) and scattered in.

Reference semantics reproduced exactly (DGL 0.6.1 GATConv as specified in
ops/gat.py): shared no-bias projection, LeakyReLU(0.2), softmax over the
destination's in-neighbors, no self-loops.  Parity vs gat_conv_naive is
tested on CPU (tests/test_gat_sep.py); identical group/merge structure to
gat_conv_chunked (two city groups per edge, flash max-merge).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.graph import LineGraphTopology
from .gat import GATParams, LEAKY_SLOPE, PRECISION, _project

# K-axis positions: scalar per-group arrays are (..., n, K, H); payload
# arrays carry a trailing feature axis, (..., n, K, H, F).
_KS = -2
_KP = -3


def _leaky(x):
    return jnp.where(x > 0, x, LEAKY_SLOPE * x)


def _sort_with_perm(keys):
    """Sort ascending along _KS; returns (sorted_keys, perm) via one lax.sort."""
    axis = keys.ndim + _KS
    iota = jax.lax.broadcasted_iota(jnp.int32, keys.shape, axis)
    return jax.lax.sort((keys, iota), dimension=axis, is_stable=False,
                        num_keys=1)


def _searchsorted_right(sorted_keys, t):
    """pos = #{j : sorted_keys[j] <= t} along _KS, one pos per element of t.

    sorted_keys: (..., K, H) ascending along _KS; t: (..., K, H) (its K axis
    indexes query rows i).  Pure vectorized binary search: ceil(log2(K+1))
    take_along_axis steps, no O(K^2) comparison matrix.
    """
    K = sorted_keys.shape[_KS]
    lo = jnp.zeros(t.shape, jnp.int32)
    hi = jnp.full(t.shape, K, jnp.int32)
    for _ in range((K + 1).bit_length()):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(sorted_keys, jnp.minimum(mid, K - 1), axis=_KS)
        go_right = (v <= t) & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _scan_payload(x, prec, suffix=False):
    """Inclusive prefix (or suffix) sum of (..., K, H, F) along _KP as an MXU
    triangular matmul.

    Batched (K,K)@(K,H*F) beats XLA's log-step cumsum on TPU for these sizes;
    f32 accumulation regardless of operand dtype.  Suffix sums are computed
    DIRECTLY (triu matmul) rather than as total-minus-prefix: with bf16
    payloads the subtraction cancels catastrophically whenever the suffix is
    small against the total.
    """
    lead = x.shape[:-3]
    K, H, F = x.shape[-3:]
    ones = jnp.ones((K, K), x.dtype)
    tri = jnp.triu(ones) if suffix else jnp.tril(ones)
    out = jax.lax.dot_general(
        tri, x.reshape(lead + (K, H * F)),
        (((1,), (len(lead),)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32)
    # non-batched contraction puts tri's row axis first
    out = jnp.moveaxis(out, 0, -2)
    return out.reshape(lead + (K, H, F))


def gat_conv_sep_partials(params: GATParams, topo: LineGraphTopology,
                          x: jax.Array, n_heads: int, fast: bool = False):
    """Per-group flash partials (m_g, z_g, num_g): (..., n, K, H[, F]).

    z/num are exp-offset by the m_g rows (same contract as gat_conv_chunked's
    chunk_partials) so callers flash-merge the two groups per edge.
    """
    n = topo.n
    K = n - 1
    prec = jax.lax.Precision.DEFAULT if fast else PRECISION
    h, el, er = _project(params, x, n_heads, fast)  # (...,E,H,F), (...,E,H)

    city = jnp.asarray(topo.city_edges)  # (n, K)
    h_c = h[..., city, :, :]   # (..., n, K, H, F)
    el_c = el[..., city, :]    # (..., n, K, H)
    er_c = er[..., city, :]

    # Group max / second max of el (per head) and the argmax row id.
    M = jnp.max(el_c, axis=_KS, keepdims=True)                   # (...,n,1,H)
    jmax = jnp.argmax(el_c, axis=_KS, keepdims=True)             # (...,n,1,H)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, el_c.shape, el_c.ndim + _KS)
    M2 = jnp.max(jnp.where(iota_k == jmax, -jnp.inf, el_c), axis=_KS,
                 keepdims=True)

    # Exact row max m_i over j != i (leaky is monotone increasing).
    maxel_noti = jnp.where(iota_k == jmax, M2, M)                # (...,n,K,H)
    m_g = _leaky(maxel_noti + er_c)

    # Separable factors (all <= 1 on rows i != jmax).
    A = jnp.exp(el_c - M)
    C = jnp.exp(LEAKY_SLOPE * (el_c - M))
    B = jnp.exp(er_c + M - m_g)
    Dn = jnp.exp(LEAKY_SLOPE * (er_c + M) - m_g)

    # One sort per (group, head); payloads to prefix sums in sorted order.
    pay_dt = jnp.bfloat16 if fast else h_c.dtype
    el_s, perm = _sort_with_perm(el_c)
    A_s = jnp.take_along_axis(A, perm, axis=_KS)
    C_s = jnp.take_along_axis(C, perm, axis=_KS)
    Ah = (A[..., None] * h_c).astype(pay_dt)
    Ch = (C[..., None] * h_c).astype(pay_dt)
    Ah_s = jnp.take_along_axis(Ah, perm[..., None], axis=_KP)
    Ch_s = jnp.take_along_axis(Ch, perm[..., None], axis=_KP)

    PC = jnp.cumsum(C_s, axis=_KS)                   # prefix of C (f32)
    SA = jnp.flip(jnp.cumsum(jnp.flip(A_s, _KS), axis=_KS), _KS)  # suffix of A
    PCh = _scan_payload(Ch_s, prec)                  # f32 out (accumulated)
    SAh = _scan_payload(Ah_s, prec, suffix=True)

    # Threshold split per row i: el_j > -er_i  <=>  sorted rank > pos_i.
    # Negative branch = prefix at rank pos-1; positive branch = suffix at
    # rank pos (both gathered directly — no total-minus-prefix cancellation).
    pos = _searchsorted_right(el_s, -er_c)                       # (...,n,K,H)
    idx_lo = jnp.maximum(pos - 1, 0)
    nz_lo = (pos > 0).astype(A.dtype)
    idx_hi = jnp.minimum(pos, K - 1)
    nz_hi = (pos < K).astype(A.dtype)

    sum_neg = jnp.take_along_axis(PC, idx_lo, axis=_KS) * nz_lo
    sum_pos = jnp.take_along_axis(SA, idx_hi, axis=_KS) * nz_hi
    num_neg = (jnp.take_along_axis(PCh, idx_lo[..., None], axis=_KP)
               * nz_lo[..., None])
    num_pos = (jnp.take_along_axis(SAh, idx_hi[..., None], axis=_KP)
               * nz_hi[..., None])

    # Self-exclusion in the linear domain (bounded cancellation, see header).
    self_pos = (el_c + er_c) > 0
    Ah32, Ch32 = A[..., None] * h_c, C[..., None] * h_c
    sum_pos = sum_pos - jnp.where(self_pos, A, 0.0)
    sum_neg = sum_neg - jnp.where(self_pos, 0.0, C)
    num_pos = num_pos - jnp.where(self_pos[..., None], Ah32, 0.0)
    num_neg = num_neg - jnp.where(self_pos[..., None], 0.0, Ch32)

    z_g = B * sum_pos + Dn * sum_neg
    num_g = B[..., None] * num_pos + Dn[..., None] * num_neg

    # Direct O(K) recomputation of the one row i = jmax per (group, head),
    # where the shared scale M breaks the <= 1 factor bounds.
    er_star = jnp.take_along_axis(er_c, jmax, axis=_KS)          # (...,n,1,H)
    m_star = _leaky(M2 + er_star)
    s_star = _leaky(el_c + er_star)                              # (...,n,K,H)
    p_star = jnp.where(iota_k == jmax, 0.0, jnp.exp(s_star - m_star))
    z_star = jnp.sum(p_star, axis=_KS, keepdims=True)            # (...,n,1,H)
    num_star = jnp.einsum("...kh,...khf->...hf", p_star.astype(pay_dt),
                          h_c.astype(pay_dt), precision=prec,
                          preferred_element_type=jnp.float32)
    is_star = iota_k == jmax
    z_g = jnp.where(is_star, z_star, z_g)
    num_g = jnp.where(is_star[..., None], num_star[..., None, :, :], num_g)
    return m_g, z_g, num_g


def gat_conv_sep(params: GATParams, topo: LineGraphTopology, x: jax.Array,
                 n_heads: int, fast: bool = False) -> jax.Array:
    """x: (..., E, C_in) -> (..., E, H * F); numerics match gat_conv_naive
    (up to float summation order).  fast=True = bf16 MXU/payload passes
    (the high-throughput inference mode)."""
    n = topo.n
    m_g, z_g, num_g = gat_conv_sep_partials(params, topo, x, n_heads, fast)
    H = z_g.shape[-1]
    F = num_g.shape[-1]

    slot_u = jnp.asarray(topo.slot_u)
    slot_v = jnp.asarray(topo.slot_v)
    E2 = n * (n - 1)
    m_flat = m_g.reshape(m_g.shape[:-3] + (E2, H))
    z_flat = z_g.reshape(z_g.shape[:-3] + (E2, H))
    num_flat = num_g.reshape(num_g.shape[:-4] + (E2, H, F))

    m_u, m_v = m_flat[..., slot_u, :], m_flat[..., slot_v, :]
    m = jnp.maximum(m_u, m_v)
    su, sv = jnp.exp(m_u - m), jnp.exp(m_v - m)
    z = z_flat[..., slot_u, :] * su + z_flat[..., slot_v, :] * sv
    num = (num_flat[..., slot_u, :, :] * su[..., None]
           + num_flat[..., slot_v, :, :] * sv[..., None])
    out = num / z[..., None]
    return out.reshape(out.shape[:-2] + (-1,))
