"""Edge-partitioned GAT message passing over a device mesh (shard_map).

The line graph of K_n has O(n^2) nodes and O(n^3) directed adjacencies; at
tsp1000 that is ~1e9 neighbor pairs — past single-chip memory (SURVEY §5
"long context").  The city-group formulation (ops/gat.py) shards naturally:
mesh axis "model" partitions the *cities*; each device computes the dense
(n-1)x(n-1) attention blocks of its own city groups, then device-local group
partials are all-gathered in flat slot space and every edge reads its two
slots (one per endpoint).  Numerical stability across the two groups of an
edge uses flash-attention-style max merging: group maxima are all-gathered
first, each edge's true max is the max of its two slots, and exp offsets are
applied per group before the weighted sums.

Zero scatters; the only collectives are two all_gathers over "model"
(group maxima, then [numerator | denominator] partials).

Layout requirement: n % mesh.shape["model"] == 0 (cities split evenly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.graph import LineGraphTopology
from .gat import GATParams, LEAKY_SLOPE, _project


def gat_conv_sharded(params: GATParams, topo: LineGraphTopology, x: jax.Array,
                     n_heads: int, mesh: Mesh, axis: str = "model") -> jax.Array:
    """x: (..., E, C_in) replicated -> (..., E, H*F) replicated.

    Identical numerics to ops.gat.gat_conv (tests assert allclose); the city
    loop is partitioned across `axis`.
    """
    n = topo.n
    ndev = mesh.shape[axis]
    if n % ndev != 0:
        raise ValueError(f"n={n} must divide evenly over {ndev} '{axis}' devices")
    per = n // ndev

    h, el, er = _project(params, x, n_heads)  # (..., E, H, F), (..., E, H)
    H = n_heads
    F = h.shape[-1]
    E = topo.n_edges

    city = jnp.asarray(topo.city_edges)  # (n, n-1)
    slot_u = jnp.asarray(topo.slot_u)
    slot_v = jnp.asarray(topo.slot_v)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # outputs ARE replicated (post-all_gather combine),
                          # but that can't be statically inferred past axis_index
    )
    def run(h, el, er):
        d = jax.lax.axis_index(axis)
        ce = jax.lax.dynamic_slice_in_dim(city, d * per, per, axis=0)  # (per, n-1)

        el_c = jnp.take(el, ce, axis=-2)  # (..., per, n-1, H)
        er_c = jnp.take(er, ce, axis=-2)
        h_c = jnp.take(h, ce, axis=-3)  # (..., per, n-1, H, F)

        s = jax.nn.leaky_relu(el_c[..., :, None, :, :] + er_c[..., :, :, None, :],
                              LEAKY_SLOPE)  # (..., per, tgt, src, H)
        # self pair (tgt == src diagonal) masked before max/exp — post-hoc
        # subtraction cancels catastrophically when a self score dominates
        # (see ops/gat.py); the two groups then hold only real neighbors
        s = jnp.where(jnp.eye(n - 1, dtype=bool)[:, :, None], -jnp.inf, s)

        # Phase 1: group maxima -> all_gather -> per-edge max over both slots.
        m_g = s.max(axis=-2)  # (..., per, n-1, H)
        m_all = jax.lax.all_gather(m_g, axis, axis=0, tiled=False)
        # (ndev, ..., per, n-1, H) -> flat slot space (..., n*(n-1), H)
        m_all = jnp.moveaxis(m_all, 0, -4)
        m_flat = m_all.reshape(m_all.shape[:-4] + (n * (n - 1), H))
        m = jnp.maximum(jnp.take(m_flat, slot_u, axis=-2),
                        jnp.take(m_flat, slot_v, axis=-2))  # (..., E, H)

        # Phase 2: stabilized partials -> all_gather -> per-edge combine.
        m_c = jnp.take(m, ce, axis=-2)  # (..., per, n-1, H) target-indexed
        p = jnp.exp(s - m_c[..., :, :, None, :])
        z_g = p.sum(axis=-2)  # (..., per, n-1, H)
        num_g = jnp.einsum("...uijh,...ujhf->...uihf", p, h_c,
                           preferred_element_type=jnp.float32)

        zn = jnp.concatenate([num_g, z_g[..., None]], axis=-1)  # (..., per, n-1, H, F+1)
        zn_all = jax.lax.all_gather(zn, axis, axis=0, tiled=False)
        zn_all = jnp.moveaxis(zn_all, 0, -5)
        zn_flat = zn_all.reshape(zn_all.shape[:-5] + (n * (n - 1), H, F + 1))
        zn_e = (jnp.take(zn_flat, slot_u, axis=-3)
                + jnp.take(zn_flat, slot_v, axis=-3))  # (..., E, H, F+1)

        num = zn_e[..., :F]
        z = zn_e[..., F]
        return num / z[..., None]

    out = run(h, el, er)
    return out.reshape(out.shape[:-2] + (H * F,))
