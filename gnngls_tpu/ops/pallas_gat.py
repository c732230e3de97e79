"""Pallas fused GAT kernel: per-city-group scores + softmax + aggregation.

The XLA city-group path (ops/gat.py) materializes the (n, n-1, n-1, H) score
tensor in HBM (31 MB/layer at tsp100, 4 GB at tsp500) — the op is HBM-bound.
This kernel fuses score -> leaky -> exp -> weighted-aggregate per
(batch, city) grid cell entirely in VMEM, flash-attention-style: each group
emits its own row maxima plus max-offset partial sums, and the two groups of
every edge are merged outside with standard rescaling

    m = max(m_u, m_v);  Z = Z_u e^{m_u-m} + Z_v e^{m_v-m};  (same numerators)

which is mathematically identical to the one-pass softmax (tests assert
allclose vs the oracle paths).

Mosaic layout strategy ("repeat-to-lanes"): per-head scalars (el, er, maxima,
denominators) are replicated across each head's F feature lanes so every
in-kernel tensor has the full H*F = lane-aligned minor dimension — zero
in-kernel slicing, pure 2-D/3-D VPU ops:

    p[i, j, h*F+f] = exp(leaky(el[j,h] + er[i,h]) - m[i,h])   (f-independent)
    num[i, :]      = sum_j p[i, j, :] * hc[j, :]
    z , m          = row-sum / row-max of p (naturally lane-replicated)

The redundant x F score arithmetic is free next to the memory traffic saved.
VMEM footprint is the (g, g, HF) block: fine through n ~ 128; larger n needs
a source-chunked variant (future work, noted in SURVEY plan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..core.graph import LineGraphTopology
from .gat import GATParams, LEAKY_SLOPE, _project


def _group_kernel(el_ref, er_ref, hc_ref, m_ref, z_ref, num_ref):
    """One (batch, city) cell.  All refs (g, HF); scalars lane-replicated."""
    el = el_ref[0, 0]  # (g, HF) source scores, head-replicated
    er = er_ref[0, 0]  # (g, HF) target scores
    hc = hc_ref[0, 0]  # (g, HF) member features
    g = el.shape[0]

    s = er[:, None, :] + el[None, :, :]  # (g_tgt, g_src, HF)
    s = jnp.where(s > 0, s, LEAKY_SLOPE * s)
    # mask the self pair (tgt == src diagonal) BEFORE max/exp — subtracting
    # e^{s_self - m} afterwards cancels catastrophically when the self score
    # dominates its group (no self-loops in the reference line graph,
    # gnngls/datasets.py:56)
    tt = jax.lax.broadcasted_iota(jnp.int32, (g, g, 1), 0)
    ss = jax.lax.broadcasted_iota(jnp.int32, (g, g, 1), 1)
    s = jnp.where(tt == ss, -3.0e38, s)
    m = jnp.max(s, axis=1)  # (g, HF)
    p = jnp.exp(s - m[:, None, :])
    m_ref[0, 0] = m
    z_ref[0, 0] = jnp.sum(p, axis=1)
    num_ref[0, 0] = jnp.sum(p * hc[None, :, :], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _group_partials(el_rep, er_rep, hc, interpret: bool = False):
    """(B, n, g, HF) x3 -> lane-replicated (m, z) and num, all (B, n, g, HF)."""
    B, n, g, HF = el_rep.shape
    spec = pl.BlockSpec((1, 1, g, HF), lambda b, u: (b, u, 0, 0))
    return pl.pallas_call(
        _group_kernel,
        grid=(B, n),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, n, g, HF), jnp.float32)] * 3,
        interpret=interpret,
    )(el_rep, er_rep, hc)


def _group_kernel_chunked(el_ref, hc_ref, er_ref, m_ref, z_ref, num_ref):
    """One (batch, city, src_chunk) cell — flash accumulation over source
    chunks so VMEM holds only a (g, gs, HF) score slab (large-n variant).

    el_ref/hc_ref: (gs, HF) source chunk; er_ref: (g, HF) resident targets;
    m/z/num_ref: (g, HF) running flash state (revisited across the innermost
    grid axis; initialized at k == 0).
    """
    k = pl.program_id(2)
    el = el_ref[0, 0]  # (gs, HF)
    hc = hc_ref[0, 0]
    er = er_ref[0, 0]  # (g, HF)
    g = er.shape[0]
    gs = el.shape[0]

    s = er[:, None, :] + el[None, :, :]  # (g, gs, HF)
    s = jnp.where(s > 0, s, LEAKY_SLOPE * s)
    # self pair: global source index k*gs + j == target index i
    tt = jax.lax.broadcasted_iota(jnp.int32, (g, gs, 1), 0)
    ss = jax.lax.broadcasted_iota(jnp.int32, (g, gs, 1), 1) + k * gs
    s = jnp.where(tt == ss, -3.0e38, s)

    m_k = jnp.max(s, axis=1)  # (g, HF)
    p = jnp.exp(s - m_k[:, None, :])
    z_k = jnp.sum(p, axis=1)
    num_k = jnp.sum(p * hc[None, :, :], axis=1)

    @pl.when(k == 0)
    def _init():
        m_ref[0, 0] = m_k
        z_ref[0, 0] = z_k
        num_ref[0, 0] = num_k

    @pl.when(k > 0)
    def _merge():
        m_old = m_ref[0, 0]
        m_new = jnp.maximum(m_old, m_k)
        so = jnp.exp(m_old - m_new)
        sk = jnp.exp(m_k - m_new)
        m_ref[0, 0] = m_new
        z_ref[0, 0] = z_ref[0, 0] * so + z_k * sk
        num_ref[0, 0] = num_ref[0, 0] * so + num_k * sk


@functools.partial(jax.jit, static_argnames=("gs", "interpret"))
def _group_partials_chunked(el_rep, er_rep, hc, gs: int,
                            interpret: bool = False):
    """Source-chunked flash partials: (B, n, g, HF) x3 with the source axis
    of el/hc padded to K*gs -> (m, z, num) each (B, n, g, HF)."""
    B, n, g, HF = er_rep.shape
    gp = el_rep.shape[2]
    K = gp // gs
    src_spec = pl.BlockSpec((1, 1, gs, HF), lambda b, u, k: (b, u, k, 0))
    tgt_spec = pl.BlockSpec((1, 1, g, HF), lambda b, u, k: (b, u, 0, 0))
    return pl.pallas_call(
        _group_kernel_chunked,
        grid=(B, n, K),
        in_specs=[src_spec, src_spec, tgt_spec],
        out_specs=[tgt_spec, tgt_spec, tgt_spec],
        out_shape=[jax.ShapeDtypeStruct((B, n, g, HF), jnp.float32)] * 3,
        interpret=interpret,
    )(el_rep, hc, er_rep)


def _group_kernel_mxu(el_ref, er_ref, hc_ref, m_ref, z_ref, num_ref):
    """One (batch, city) cell, per-head MXU aggregation (throughput variant).

    el/er_ref: (g, H) raw per-head scores — NOT lane-replicated, so the
    score/exp/max elementwise work is H lanes instead of H*F (16x less VPU
    traffic at the shipped 8x16 head layout); the weighted aggregation runs
    as H small (g, g) @ (g, F) MXU matmuls instead of a VPU
    multiply-reduce.  Emits lane-replicated (m, z) like _group_kernel so the
    combine path outside is shared.
    """
    el = el_ref[0, 0]  # (g, H)
    er = er_ref[0, 0]
    hc = hc_ref[0, 0]  # (g, HF)
    g, H = el.shape
    F = hc.shape[1] // H

    s = er[:, None, :] + el[None, :, :]  # (g, g, H)
    s = jnp.where(s > 0, s, LEAKY_SLOPE * s)
    tt = jax.lax.broadcasted_iota(jnp.int32, (g, g, 1), 0)
    ss = jax.lax.broadcasted_iota(jnp.int32, (g, g, 1), 1)
    s = jnp.where(tt == ss, -3.0e38, s)
    m = jnp.max(s, axis=1)  # (g, H)
    p = jnp.exp(s - m[:, None, :])  # (g, g, H)
    z = jnp.sum(p, axis=1)  # (g, H)

    for h in range(H):  # static unroll: H batched MXU matmuls
        num_h = jnp.dot(p[:, :, h], hc[:, h * F:(h + 1) * F],
                        preferred_element_type=jnp.float32)
        num_ref[0, 0, :, h * F:(h + 1) * F] = num_h

    # lane-replicate the per-head scalars for the shared combine path
    m_ref[0, 0] = jnp.repeat(m, F, axis=1)
    z_ref[0, 0] = jnp.repeat(z, F, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _group_partials_mxu(el_c, er_c, hc, interpret: bool = False):
    """(B, n, g, H) x2 + (B, n, g, HF) -> lane-replicated (m, z) and num."""
    B, n, g, H = el_c.shape
    HF = hc.shape[-1]
    spec_h = pl.BlockSpec((1, 1, g, H), lambda b, u: (b, u, 0, 0))
    spec_hf = pl.BlockSpec((1, 1, g, HF), lambda b, u: (b, u, 0, 0))
    return pl.pallas_call(
        _group_kernel_mxu,
        grid=(B, n),
        in_specs=[spec_h, spec_h, spec_hf],
        out_specs=[spec_hf, spec_hf, spec_hf],
        out_shape=[jax.ShapeDtypeStruct((B, n, g, HF), jnp.float32)] * 3,
        interpret=interpret,
    )(el_c, er_c, hc)


def gat_conv_pallas(params: GATParams, topo: LineGraphTopology, x: jax.Array,
                    n_heads: int, *, interpret: bool | None = None,
                    src_chunk: int = 0, mxu: bool = False) -> jax.Array:
    """Drop-in replacement for ops.gat.gat_conv via the fused kernel.

    x: (..., E, C_in) -> (..., E, H*F).

    src_chunk: 0 = auto.  For groups whose (g, g, HF) score slab fits VMEM
    (n <= ~128 at HF=128) the one-shot kernel runs; otherwise sources are
    streamed in chunks of src_chunk with flash max-merging (lifts the
    round-1 n~128 ceiling to tsp1000-class sizes).
    """
    n = topo.n
    if interpret is None:  # auto: the compiled kernel is TPU-only
        interpret = jax.default_backend() != "tpu"
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    h, el, er = _project(params, x, n_heads)  # (B,E,H,F), (B,E,H)
    B, E, H, F = h.shape
    HF = H * F

    city = jnp.asarray(topo.city_edges)
    slot_u = jnp.asarray(topo.slot_u)
    slot_v = jnp.asarray(topo.slot_v)

    def rep(a):  # (B, E, H) -> (B, E, HF) head-replicated across F lanes
        return jnp.repeat(a, F, axis=-1)

    el_rep = rep(el)[:, city]  # (B, n, g, HF)
    er_rep = rep(er)[:, city]
    hc = h.reshape(B, E, HF)[:, city]

    g = n - 1
    slab = g * g * HF * 4  # one-shot (g, g, HF) score slab, bytes
    if src_chunk == 0 and slab > 6 * 2 ** 20:
        # auto: stream sources so the (g, gs, HF) slab stays ~4 MB
        src_chunk = max(8, (4 * 2 ** 20) // (g * HF * 4) // 8 * 8)
        if mxu:
            import warnings
            warnings.warn(
                f"pallas_mxu: n={n} exceeds the one-shot VMEM slab "
                f"({slab >> 20} MB); falling back to the source-chunked "
                f"(non-MXU) kernel — there is no chunked MXU variant yet",
                stacklevel=2)
    elif mxu and src_chunk:
        raise ValueError(
            "mxu=True is incompatible with src_chunk>0: the per-head MXU "
            "kernel has no chunked variant — pass src_chunk=0 (and n small "
            "enough for the one-shot slab) or mxu=False")
    if mxu and not src_chunk:
        el_c = el[:, city]  # (B, n, g, H) — per-head, not lane-replicated
        er_c = er[:, city]
        m_g, z_g, num_g = _group_partials_mxu(el_c, er_c, hc, interpret)
    elif src_chunk:
        gp = ((g + src_chunk - 1) // src_chunk) * src_chunk
        if gp > g:
            # padded source lanes: score -inf (never win max / add to sums)
            el_rep = jnp.pad(el_rep, ((0, 0), (0, 0), (0, gp - g), (0, 0)),
                             constant_values=-3.0e38)
            hc_p = jnp.pad(hc, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
        else:
            hc_p = hc
        m_g, z_g, num_g = _group_partials_chunked(el_rep, er_rep, hc_p,
                                                  src_chunk, interpret)
    else:
        m_g, z_g, num_g = _group_partials(el_rep, er_rep, hc, interpret)

    ng = n * (n - 1)
    m_flat = m_g.reshape(B, ng, HF)
    z_flat = z_g.reshape(B, ng, HF)
    num_flat = num_g.reshape(B, ng, HF)

    m_u, m_v = m_flat[:, slot_u], m_flat[:, slot_v]  # (B, E, HF)
    m = jnp.maximum(m_u, m_v)
    su = jnp.exp(m_u - m)
    sv = jnp.exp(m_v - m)

    z = z_flat[:, slot_u] * su + z_flat[:, slot_v] * sv
    num = num_flat[:, slot_u] * su + num_flat[:, slot_v] * sv
    out = num / z
    return out[0] if squeeze else out
