"""Pallas separable GAT: threshold-mask matmuls in VMEM, no score tensor.

Round-4 measurement (benchmarks/RESULTS_north_star.md) showed the pure-XLA
separable path (ops/gat_sep.py) is algorithmically right but lowers its
multi-axis sorts/gathers to scalar-gather loops on TPU.  This kernel keeps
the separable decomposition but replaces the sorted-prefix machinery with
*threshold-mask matmuls* computed entirely in VMEM:

  exp(leaky(el_j + er_i)) = A_j * B_i   if el_j > -er_i   (x > 0 branch)
                            C_j * D_i   otherwise
  z_i   = B_i * (P⊙)      num_i = B_i * (P @ Ah) + D_i * (N @ Ch)

where P/N are the (K, K) 0/1 indicator matrices [el_j + er_i > 0, j != i] /
[<= 0, j != i].  P and N are *built on the fly* from the rank-1 broadcast
el_j + er_i (two VPU ops per element, no exp, no HBM round-trip) and
immediately consumed by an MXU matmul against the (K, F) weighted feature
tile — so the O(K^2) object never exists outside VMEM, and the only
transcendentals are O(K) exps per group.  Compare: the einsum path pays
~5 VPU ops *including exp* per K^2 element plus HBM round-trips of the
(B, n, K, K, H) tensor; the DGL CUDA kernels this replaces
(gnngls/models.py:22-24) gather/scatter over an explicit sparse graph.

Numerical envelope: factors satisfy A_j, C_j <= 1 and B_i, D_i <= exp(M - M2)
(group max minus second max; see ops/gat_sep.py's invariants).  Unlike the
XLA sep path there is NO special-cased argmax row: products A_j * B_i
reconstruct exp(s_ij - m_i) exactly as long as A_j does not underflow while
B_i overflows, i.e. whenever M - M2 < ~80 — astronomically beyond trained
attention-logit spreads (|el| ~ 10); parity tests cover spread x10.

Outputs per-group flash partials (m_g, z_g, num_g) with the same contract as
gat_conv_sep_partials; the two-group merge reuses gat_sep's XLA epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..core.graph import LineGraphTopology
from .gat import GATParams, LEAKY_SLOPE, _project

_NEG = -3.0e38


def _sep_kernel(el_ref, er_ref, hv_ref, m_ref, z_ref, num_ref, *,
                gc: int, n_heads: int):
    """One grid cell = gc city groups, all heads.

    el/er: (1, gc, K, H); hv: (1, gc, K, H, F) (projected features,
    group-gathered, optionally bf16).  Outputs same layouts.
    """
    K = el_ref.shape[2]
    F = hv_ref.shape[4]
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (gc, K, K), 2)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (gc, K, K), 1)
    offdiag = iota_j != iota_i

    cc_k = jax.lax.broadcasted_iota(jnp.int32, (gc, K), 1)
    for h in range(n_heads):
        el = el_ref[0, :, :, h]  # (gc, K)
        er = er_ref[0, :, :, h]
        M = jnp.max(el, axis=1, keepdims=True)               # (gc, 1)
        # mask exactly the FIRST argmax occurrence when computing the second
        # max (as gat_sep.py does): masking every tied element would give
        # M2 = -inf on constant rows and overflow B/D = exp(er + M - m)
        amax = jnp.min(jnp.where(el == M, cc_k, K), axis=1, keepdims=True)
        is_star = cc_k == amax
        M2 = jnp.max(jnp.where(is_star, _NEG, el), axis=1, keepdims=True)
        maxel_noti = jnp.where(is_star, M2, M)               # (gc, K)
        arg = maxel_noti + er
        m = jnp.where(arg > 0, arg, LEAKY_SLOPE * arg)       # row max, exact

        A = jnp.exp(el - M)                                  # (gc, K) <= 1
        C = jnp.exp(LEAKY_SLOPE * (el - M))
        B = jnp.exp(er + M - m)
        D = jnp.exp(LEAKY_SLOPE * (er + M) - m)

        # rank-1 threshold tile, built and consumed in VMEM
        X = el[:, None, :] + er[:, :, None]                  # (gc, K, K)
        posm = ((X > 0) & offdiag)
        negm = ((X <= 0) & offdiag)
        pos_f = posm.astype(jnp.float32)
        neg_f = negm.astype(jnp.float32)

        # z: masked row-reductions (VPU)
        z_pos = jnp.sum(pos_f * A[:, None, :], axis=2)       # (gc, K)
        z_neg = jnp.sum(neg_f * C[:, None, :], axis=2)
        z = B * z_pos + D * z_neg

        # num: per-group masked matmuls (MXU), f32 accumulation
        hv = hv_ref[0, :, :, h, :]                            # (gc, K, F)
        Ah = A[:, :, None].astype(hv.dtype) * hv
        Ch = C[:, :, None].astype(hv.dtype) * hv
        # f32 payloads keep HIGHEST (bf16x6-exact) matmul precision — at
        # DEFAULT the f32 operands round to bf16 and hardware parity
        # degrades to ~1e-3; bf16 payloads (fast mode) use the native pass
        prec = (jax.lax.Precision.HIGHEST if hv.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        for g in range(gc):
            np_ = jax.lax.dot_general(
                pos_f[g].astype(hv.dtype), Ah[g],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            nn_ = jax.lax.dot_general(
                neg_f[g].astype(hv.dtype), Ch[g],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            num_ref[0, g, :, h, :] = B[g][:, None] * np_ + D[g][:, None] * nn_

        m_ref[0, :, :, h] = m
        z_ref[0, :, :, h] = z


def gat_conv_pallas_sep_partials(params: GATParams, topo: LineGraphTopology,
                                 x: jax.Array, n_heads: int,
                                 fast: bool = False, group_chunk: int = 4,
                                 interpret: bool | None = None):
    """Per-group flash partials via the threshold-mask kernel.

    Same contract as gat_conv_sep_partials (gat_sep.py)."""
    if interpret is None:  # compiled on TPU, interpreted elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
    n = topo.n
    K = n - 1
    if n % group_chunk != 0:
        group_chunk = max(g for g in range(1, group_chunk + 1) if n % g == 0)
    h, el, er = _project(params, x, n_heads, fast)
    F = h.shape[-1]

    city = jnp.asarray(topo.city_edges)
    lead = x.shape[:-2]
    hv = h[..., city, :, :].astype(jnp.bfloat16 if fast else h.dtype)
    el_c = el[..., city, :]
    er_c = er[..., city, :]
    # flatten leading dims into one batch axis for the grid
    Bf = 1
    for d in lead:
        Bf *= d
    el_c = el_c.reshape((Bf, n, K, n_heads))
    er_c = er_c.reshape((Bf, n, K, n_heads))
    hv = hv.reshape((Bf, n, K, n_heads, F))

    kernel = functools.partial(_sep_kernel, gc=group_chunk, n_heads=n_heads)
    grid = (Bf, n // group_chunk)
    gc = group_chunk
    # The (.., K, H, F) tiles pad F=16 to the 128-lane minor dim, so the
    # scoped-VMEM live set exceeds the 16 MB default even at gc=1 (measured
    # 19.57M on the remote compiler, round 5); v5e has far more physical
    # VMEM — raise the cap like search/pallas_gls.py does for n>=256.
    compiler_params = None
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    m_g, z_g, num_g = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, gc, K, n_heads), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, gc, K, n_heads), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, gc, K, n_heads, F),
                         lambda b, c: (b, c, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, gc, K, n_heads), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, gc, K, n_heads), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, gc, K, n_heads, F),
                         lambda b, c: (b, c, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bf, n, K, n_heads), jnp.float32),
            jax.ShapeDtypeStruct((Bf, n, K, n_heads), jnp.float32),
            jax.ShapeDtypeStruct((Bf, n, K, n_heads, F), jnp.float32),
        ],
        interpret=interpret,
    )(el_c, er_c, hv)
    shp = lead + (n, K, n_heads)
    return (m_g.reshape(shp), z_g.reshape(shp),
            num_g.reshape(shp + (F,)))


def gat_conv_pallas_sep(params: GATParams, topo: LineGraphTopology,
                        x: jax.Array, n_heads: int, fast: bool = False,
                        group_chunk: int = 4,
                        interpret: bool | None = None) -> jax.Array:
    """x: (..., E, C_in) -> (..., E, H * F); numerics match gat_conv_naive."""
    n = topo.n
    m_g, z_g, num_g = gat_conv_pallas_sep_partials(
        params, topo, x, n_heads, fast, group_chunk, interpret)
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
