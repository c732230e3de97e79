"""Graph attention over the K_n line graph, TPU-first.

Reproduces the math of DGL 0.6.1 ``GATConv`` as used by the reference model
(gnngls/models.py:22-24): shared linear projection without bias, per-head
attention vectors attn_l / attn_r, score ``LeakyReLU(el[src] + er[dst], 0.2)``,
softmax over the destination node's in-neighbors, and a weighted feature sum.
The reference line graph has no self loops (networkx line_graph;
gnngls/datasets.py:56), so a node never attends to itself — self state flows
only through the outer skip connection.

Two implementations:

* ``gat_conv_naive`` — direct gather over the explicit (E, 2(n-2)) neighbor
  matrix.  O(E * K * C) gather traffic; used as the semantic oracle in tests
  and for very small n.

* ``gat_conv`` — the TPU-native "city groups" formulation.  For each city u,
  all (n-1) incident edges form group S_u; a line-graph node (u, v) aggregates
  over S_u ∪ S_v minus itself.  Scores and weighted sums are computed per
  group as n batched dense (n-1)x(n-1) contractions (einsum -> MXU), then the
  two group partial sums are combined per edge with two flat gathers — no
  scatter, no raggedness, no sparse formats.  The double-counted self term
  (edge e appears in both of its groups) is subtracted in closed form.

Softmax is stabilized by subtracting, per destination node, the max score over
both of its groups (an upper bound that includes the self score; subtracting
any per-destination constant leaves softmax invariant).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import LineGraphTopology

LEAKY_SLOPE = 0.2  # DGL GATConv default negative_slope


class GATParams(NamedTuple):
    """Parameters of one GAT layer (DGL 0.6.1 GATConv equivalent).

    fc_w:    (C_in, H * F) projection weight (no bias, as in DGL 0.6.1).
    attn_l:  (H, F) source attention vector.
    attn_r:  (H, F) destination attention vector.
    """

    fc_w: jax.Array
    attn_l: jax.Array
    attn_r: jax.Array


def init_gat_params(key, c_in: int, n_heads: int, head_dim: int, dtype=jnp.float32) -> GATParams:
    """Xavier-normal with gain sqrt(2), matching DGL GATConv.reset_parameters."""
    k1, k2, k3 = jax.random.split(key, 3)
    gain = np.sqrt(2.0)

    def xavier_normal(k, shape, fan_in, fan_out):
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return (std * jax.random.normal(k, shape)).astype(dtype)

    hf = n_heads * head_dim
    return GATParams(
        fc_w=xavier_normal(k1, (c_in, hf), c_in, hf),
        # DGL treats attn_* as (1, H, F) tensors; xavier sees fan_in=F, fan_out=H*F... we
        # match torch.nn.init.xavier_normal_ on shape (1, H, F): fan_in = F, fan_out = F.
        attn_l=xavier_normal(k2, (n_heads, head_dim), head_dim, head_dim),
        attn_r=xavier_normal(k3, (n_heads, head_dim), head_dim, head_dim),
    )


# Full-f32 matmuls everywhere in the model: TPU einsums otherwise drop to
# bf16 passes silently, which breaks allclose parity with the reference's
# f32 torch math (observed: ~1e-3 noise, amplified to ~0.4 on small-denominator
# edges).  The model is 1.2M params — exactness is worth the extra MXU passes;
# the Pallas kernel (ops/pallas_gat.py) is the throughput path.
PRECISION = jax.lax.Precision.HIGHEST


def _project(params: GATParams, x: jax.Array, n_heads: int,
             fast: bool = False):
    """x: (..., E, C_in) -> h: (..., E, H, F), el/er: (..., E, H).

    fast=True trades exactness for speed: single-pass bf16 MXU projections
    (DEFAULT precision) with f32 accumulation."""
    hf = params.fc_w.shape[1]
    head_dim = hf // n_heads
    prec = jax.lax.Precision.DEFAULT if fast else PRECISION
    h = jnp.einsum("...ec,cd->...ed", x, params.fc_w,
                   preferred_element_type=jnp.float32, precision=prec)
    h = h.reshape(h.shape[:-1] + (n_heads, head_dim))
    el = jnp.einsum("...ehf,hf->...eh", h, params.attn_l, precision=prec)
    er = jnp.einsum("...ehf,hf->...eh", h, params.attn_r, precision=prec)
    return h, el, er


def gat_conv_naive(params: GATParams, topo: LineGraphTopology, x: jax.Array, n_heads: int) -> jax.Array:
    """Direct neighbor-gather implementation (semantic oracle).

    x: (..., E, C_in) -> (..., E, H * F).
    """
    h, el, er = _project(params, x, n_heads)
    nbr = jnp.asarray(topo.nbr)  # (E, K)

    el_n = el[..., nbr, :]  # (..., E, K, H) scores of source neighbors
    s = jax.nn.leaky_relu(el_n + er[..., :, None, :], LEAKY_SLOPE)
    alpha = jax.nn.softmax(s, axis=-2)  # over the K neighbors
    h_n = h[..., nbr, :, :]  # (..., E, K, H, F)
    out = jnp.einsum("...ekh,...ekhf->...ehf", alpha, h_n)
    return out.reshape(out.shape[:-2] + (-1,))


def gat_conv_chunked(params: GATParams, topo: LineGraphTopology, x: jax.Array,
                     n_heads: int, city_chunk: int = 16) -> jax.Array:
    """Memory-bounded city-group path for large n (tsp500/tsp1000 class).

    The plain path materializes the (n, n-1, n-1, H) score tensor (~4 GB at
    n=500); here cities are processed in chunks of `city_chunk` under
    lax.map, each chunk emitting flash-style group partials (own max,
    max-offset sums), merged per edge afterwards.  Peak score memory is
    city_chunk/n of the full tensor.  Requires n % city_chunk == 0.
    """
    n = topo.n
    if n % city_chunk != 0:
        # largest divisor of n not exceeding the request (deterministic, so
        # jit caching is stable for a given n)
        city_chunk = max(c for c in range(1, city_chunk + 1) if n % c == 0)
    h, el, er = _project(params, x, n_heads)  # (..., E, H, F), (..., E, H)
    H = n_heads
    F = h.shape[-1]

    city = jnp.asarray(topo.city_edges).reshape(n // city_chunk, city_chunk, topo.n - 1)
    slot_u = jnp.asarray(topo.slot_u)
    slot_v = jnp.asarray(topo.slot_v)

    self_mask = jnp.eye(n - 1, dtype=bool)[:, :, None]  # (tgt, src, 1)

    def chunk_partials(ce):  # ce: (chunk, n-1)
        el_c = el[..., ce, :]  # (..., chunk, n-1, H)
        er_c = er[..., ce, :]
        h_c = h[..., ce, :, :]
        s = jax.nn.leaky_relu(el_c[..., :, None, :, :] + er_c[..., :, :, None, :],
                              LEAKY_SLOPE)
        # self pair masked before max/exp (see gat_conv: post-hoc subtraction
        # cancels catastrophically when the self score dominates)
        s = jnp.where(self_mask, -jnp.inf, s)
        m = s.max(axis=-2)  # (..., chunk, n-1, H) per-group max
        p = jnp.exp(s - m[..., :, None, :])
        z = p.sum(axis=-2)
        num = jnp.einsum("...uijh,...ujhf->...uihf", p, h_c,
                         preferred_element_type=jnp.float32)
        return m, z, num

    m_g, z_g, num_g = jax.lax.map(chunk_partials, city)

    def flat(a, n_tail):
        # (n_chunks, ..., chunk, n-1, *tail) -> (..., n*(n-1), *tail)
        a = jnp.moveaxis(a, 0, -3 - n_tail)
        return a.reshape(a.shape[:-3 - n_tail] + (n * (n - 1),) + a.shape[a.ndim - n_tail:])

    m_flat = flat(m_g, 1)
    z_flat = flat(z_g, 1)
    num_flat = flat(num_g, 2)

    m_u, m_v = m_flat[..., slot_u, :], m_flat[..., slot_v, :]
    m = jnp.maximum(m_u, m_v)
    su, sv = jnp.exp(m_u - m), jnp.exp(m_v - m)
    z = z_flat[..., slot_u, :] * su + z_flat[..., slot_v, :] * sv
    num = (num_flat[..., slot_u, :, :] * su[..., None]
           + num_flat[..., slot_v, :, :] * sv[..., None])
    out = num / z[..., None]
    return out.reshape(out.shape[:-2] + (-1,))


def gat_conv(params: GATParams, topo: LineGraphTopology, x: jax.Array,
             n_heads: int, fast: bool = False) -> jax.Array:
    """City-group batched-dense implementation (the TPU fast path).

    x: (..., E, C_in) -> (..., E, H * F).  Identical numerics to
    ``gat_conv_naive`` (up to float addition order).

    fast=True is the bf16 inference mode: projections run single-pass bf16
    and the (n, n-1, n-1, H) attention tensor is cast to bf16 before the
    aggregation einsum — halves the HBM traffic and MXU input width of the
    dominant op (f32 accumulation throughout; ~1e-2 relative output noise,
    fine for search guidance — regret_pred only orders edges).
    """
    n = topo.n
    h, el, er = _project(params, x, n_heads, fast)  # (...,E,H,F), (...,E,H)

    city = jnp.asarray(topo.city_edges)  # (n, n-1)
    slot_u = jnp.asarray(topo.slot_u)  # (E,)
    slot_v = jnp.asarray(topo.slot_v)

    # Group-local views: (..., n, n-1, ...)
    h_c = h[..., city, :, :]  # (..., n, n-1, H, F)
    el_c = el[..., city, :]  # (..., n, n-1, H)
    er_c = er[..., city, :]

    # Raw scores within each group: s[u, i, j] = leaky(el[S_u[j]] + er[S_u[i]]).
    s = jax.nn.leaky_relu(el_c[..., :, None, :, :] + er_c[..., :, :, None, :], LEAKY_SLOPE)
    # (..., n, tgt n-1, src n-1, H)

    # Edge e sits in both of its groups, and inside a group the self pair is
    # the (tgt == src) diagonal.  Mask it out BEFORE max/exp: subtracting the
    # self term after the fact (z - 2 e^{s_self - m}) cancels catastrophically
    # once a self score dominates its group — observed as training NaNs.
    self_mask = jnp.eye(n - 1, dtype=bool)[:, :, None]  # (tgt, src, 1)
    s = jnp.where(self_mask, -jnp.inf, s)

    # Per-destination stabilizer: max over both groups (self excluded).
    m_g = s.max(axis=-2)  # (..., n, n-1, H) max over sources, per (group, tgt)
    m_flat = m_g.reshape(m_g.shape[:-3] + (n * (n - 1),) + m_g.shape[-1:])
    m = jnp.maximum(m_flat[..., slot_u, :], m_flat[..., slot_v, :])  # (..., E, H)
    m_c = m[..., city, :]  # back to group-local target layout (..., n, n-1, H)

    p = jnp.exp(s - m_c[..., :, :, None, :])  # (..., n, n-1, n-1, H); self -> 0

    # Partial sums per group: denominator and numerator (batched dense matmul).
    z_g = p.sum(axis=-2)  # (..., n, n-1, H)
    # NOTE: default precision — on TPU this large einsum runs bf16 passes
    # (HIGHEST here explodes compile/runtime).  For f32-exact aggregation on
    # TPU use the Pallas kernel (ops/pallas_gat.py, pure-VPU f32) or the
    # naive path; on CPU this einsum is exact f32 (parity tests run there).
    if fast:
        p = p.astype(jnp.bfloat16)
        h_c = h_c.astype(jnp.bfloat16)
    num_g = jnp.einsum("...uijh,...ujhf->...uihf", p, h_c,
                       preferred_element_type=jnp.float32)  # (..., n, n-1, H, F)

    z_flat = z_g.reshape(z_g.shape[:-3] + (n * (n - 1),) + z_g.shape[-1:])
    num_flat = num_g.reshape(num_g.shape[:-4] + (n * (n - 1),) + num_g.shape[-2:])

    z = z_flat[..., slot_u, :] + z_flat[..., slot_v, :]
    num = num_flat[..., slot_u, :, :] + num_flat[..., slot_v, :, :]
    out = num / z[..., None]
    return out.reshape(out.shape[:-2] + (-1,))
