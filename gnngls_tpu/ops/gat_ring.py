"""Memory-sharded GAT message passing: edge-sharded activations + ring exchange.

`ops/gat_sharded.py` partitions the city-group *compute* but replicates the
edge activations and all-gathers full flat-slot tensors — per-device memory
does not shrink, so tsp1000-class line graphs (E = n(n-1)/2 edges, ~1e9
directed adjacencies, SURVEY §5 "long context") stay bounded by one chip's
HBM.  This module is the memory-sharded path (VERDICT r1 item 5):

  * Edge activations x live SHARDED over mesh axis `axis`: each device owns a
    contiguous range of `eper = Ep/ndev` edge ids and only ever materializes
    E-space tensors of that size (1/ndev of the single-chip path).
  * Each device is home to `per = n/ndev` cities and computes their dense
    (n-1)x(n-1) attention groups (the MXU formulation of ops/gat.py, chunked
    flash-style so peak score memory is city_chunk/n of the full tensor).
  * Two ppermute rings replace the all_gathers:
      ring 1 streams the projected edge shards (h) around the mesh; each
        device picks the slots its home cities need into a group buffer
        (each edge is needed by exactly its two endpoint cities);
      ring 2 streams the per-group partial sums [numerator | denominator]
        back; each device extracts the two slots of each edge it owns.
    Only one visiting block is resident per step — the 543 MB flat-slot
    gather of the replicated path at n=1000 becomes an ndev-step stream of
    1/ndev-size blocks that XLA can overlap with the local block compute.
  * The only all_gather is the per-(group, target) score maxima (H numbers
    per line-graph slot — 32 MB at n=1000), which pins the softmax
    stabilizer to the true per-edge max before any exp.

Numerics are identical to ops.gat.gat_conv / gat_conv_chunked (tests assert
allclose on the virtual 8-device mesh).  Reference op being scaled: DGL
GATConv over the line graph, gnngls/models.py:23.

Layout requirements: n % ndev == 0 (cities split evenly); edges are padded to
Ep = ndev * ceil(E/ndev) (see ring_pad / ring_unpad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.graph import LineGraphTopology
from .gat import GATParams, LEAKY_SLOPE, PRECISION


def padded_edges(E: int, ndev: int) -> int:
    """Edge count padded so every device owns an equal contiguous range."""
    return ndev * ((E + ndev - 1) // ndev)


def ring_pad(x: np.ndarray, ndev: int, axis: int = -2) -> np.ndarray:
    """Pad the edge axis of x from E to padded_edges(E, ndev) with zeros."""
    E = x.shape[axis]
    Ep = padded_edges(E, ndev)
    if Ep == E:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis % x.ndim] = (0, Ep - E)
    return jnp.pad(x, pad) if isinstance(x, jax.Array) else np.pad(x, pad)


def ring_unpad(x, E: int, axis: int = -2):
    """Strip edge padding back to the true E."""
    idx = [slice(None)] * x.ndim
    idx[axis % x.ndim] = slice(0, E)
    return x[tuple(idx)]


def edge_sharding(mesh: Mesh, ndim: int, axis: str = "model",
                  edge_axis: int = -2) -> NamedSharding:
    """NamedSharding that splits the edge axis of a rank-`ndim` array."""
    spec = [None] * ndim
    spec[edge_axis % ndim] = axis
    return NamedSharding(mesh, P(*spec))


def gat_conv_ring(params: GATParams, topo: LineGraphTopology, x: jax.Array,
                  n_heads: int, mesh: Mesh, axis: str = "model",
                  city_chunk: int = 8) -> jax.Array:
    """x: (..., Ep, C_in) edge-SHARDED over `axis` -> (..., Ep, H*F) edge-sharded.

    Ep = padded_edges(topo.n_edges, ndev); entries past n_edges are padding
    (zeros in, garbage out — strip with ring_unpad).
    """
    n = topo.n
    E = topo.n_edges
    ndev = mesh.shape[axis]
    if n % ndev != 0:
        raise ValueError(f"n={n} must divide evenly over {ndev} '{axis}' devices")
    per = n // ndev
    if per % city_chunk != 0:
        city_chunk = max(c for c in range(1, city_chunk + 1) if per % c == 0)
    Ep = padded_edges(E, ndev)
    eper = Ep // ndev
    if x.shape[-2] != Ep:
        raise ValueError(f"edge axis must be padded to {Ep}, got {x.shape[-2]}")

    H = n_heads
    hf = params.fc_w.shape[1]
    F = hf // H

    # Replicated index tables (int32: ~n^2 entries, a few MB at n=1000).
    city = jnp.asarray(topo.city_edges)  # (n, n-1) edge ids per city group
    slot_u = jnp.asarray(np.pad(topo.slot_u, (0, Ep - E)))  # (Ep,)
    slot_v = jnp.asarray(np.pad(topo.slot_v, (0, Ep - E)))
    gsz = per * (n - 1)  # flat slots per home device

    nbatch = x.ndim - 2
    xspec = P(*([None] * nbatch), axis, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(xspec,),
        out_specs=xspec,
        check_vma=False,  # axis_index-driven gathers defeat static inference
    )
    def run(x_sh):  # x_sh: (..., eper, C)
        d = jax.lax.axis_index(axis)
        ce = jax.lax.dynamic_slice_in_dim(city, d * per, per, 0)  # (per, n-1)
        su_own = jax.lax.dynamic_slice_in_dim(slot_u, d * eper, eper)  # (eper,)
        sv_own = jax.lax.dynamic_slice_in_dim(slot_v, d * eper, eper)

        # Local projection of the owned edge shard (1/ndev of E-space).
        h = jnp.einsum("...ec,cd->...ed", x_sh, params.fc_w,
                       preferred_element_type=jnp.float32, precision=PRECISION)
        h = h.reshape(h.shape[:-1] + (H, F))  # (..., eper, H, F)

        perm = [(i, (i - 1) % ndev) for i in range(ndev)]

        # --- ring 1: fill home-city group buffers from circulating shards --
        def fill(t, carry):
            vis, buf = carry
            o = (d + t) % ndev  # shard currently visiting originated at o
            mask = (ce >= o * eper) & (ce < (o + 1) * eper)  # (per, n-1)
            idx = jnp.clip(ce - o * eper, 0, eper - 1)
            got = jnp.take(vis, idx, axis=-3)  # (..., per, n-1, H, F)
            buf = jnp.where(mask[..., None, None], got, buf)
            # permute unconditionally (a collective inside lax.cond can
            # deadlock); after ndev steps the shard is back home
            vis = jax.lax.ppermute(vis, axis, perm)
            return vis, buf

        buf0 = jnp.zeros(x_sh.shape[:-2] + (per, n - 1, H, F), jnp.float32)
        _, h_c = jax.lax.fori_loop(0, ndev, fill, (h, buf0))

        # Attention scores are linear in h: compute el/er from the buffer.
        el_c = jnp.einsum("...hf,hf->...h", h_c, params.attn_l,
                          precision=PRECISION)  # (..., per, n-1, H)
        er_c = jnp.einsum("...hf,hf->...h", h_c, params.attn_r,
                          precision=PRECISION)

        self_mask = jnp.eye(n - 1, dtype=bool)[:, :, None]
        cchunks = per // city_chunk

        def group_scores(el_k, er_k):
            # (..., chunk, n-1, H) x2 -> (..., chunk, tgt n-1, src n-1, H)
            s = jax.nn.leaky_relu(
                el_k[..., :, None, :, :] + er_k[..., :, :, None, :],
                LEAKY_SLOPE)
            return jnp.where(self_mask, -jnp.inf, s)

        def chunk3(a):
            # (..., per, n-1, H) -> (cchunks, ..., chunk, n-1, H)
            a = a.reshape(a.shape[:-3] + (cchunks, city_chunk) + a.shape[-2:])
            return jnp.moveaxis(a, -4, 0)

        def chunk4(a):
            # (..., per, n-1, H, F) -> (cchunks, ..., chunk, n-1, H, F)
            a = a.reshape(a.shape[:-4] + (cchunks, city_chunk) + a.shape[-3:])
            return jnp.moveaxis(a, -5, 0)

        el_ck = chunk3(el_c)  # (cc, ..., chunk, n-1, H)
        er_ck = chunk3(er_c)

        # Pass 1 (flash): per-(group, target) maxima, then all_gather so every
        # edge's stabilizer is its TRUE max over both endpoint groups.
        m_g = jax.lax.map(lambda ab: group_scores(*ab).max(axis=-2),
                          (el_ck, er_ck))  # (cc, ..., chunk, n-1, H)
        m_g = jnp.moveaxis(m_g, 0, -4)
        m_g = m_g.reshape(m_g.shape[:-4] + (gsz, H))  # (..., per*(n-1), H)
        m_all = jax.lax.all_gather(m_g, axis, axis=0, tiled=False)
        m_all = jnp.moveaxis(m_all, 0, -3)
        m_flat = m_all.reshape(m_all.shape[:-3] + (n * (n - 1), H))
        su_c = jnp.take(slot_u, ce, axis=0)  # (per, n-1) flat slots
        sv_c = jnp.take(slot_v, ce, axis=0)
        m_c = jnp.maximum(jnp.take(m_flat, su_c, axis=-2),
                          jnp.take(m_flat, sv_c, axis=-2))  # (..., per, n-1, H)

        # Pass 2: stabilized partial sums per group (scores recomputed,
        # flash-style — the score tensor never exceeds one city chunk).
        h_ck = chunk4(h_c)
        m_ck = chunk3(m_c)

        def chunk_partials(args):
            el_k, er_k, h_k, m_k = args
            s = group_scores(el_k, er_k)
            p = jnp.exp(s - m_k[..., :, None, :])
            z = p.sum(axis=-2)  # (..., chunk, n-1, H)
            num = jnp.einsum("...uijh,...ujhf->...uihf", p, h_k,
                             preferred_element_type=jnp.float32)
            return jnp.concatenate([num, z[..., None]], axis=-1)

        zn = jax.lax.map(chunk_partials, (el_ck, er_ck, h_ck, m_ck))
        zn = jnp.moveaxis(zn, 0, -5)  # (..., cc, chunk, n-1, H, F+1)
        zn = zn.reshape(zn.shape[:-5] + (gsz, H, F + 1))

        # --- ring 2: stream partials; owners extract their edges' two slots -
        def collect(t, carry):
            vis, acc = carry
            o = (d + t) % ndev
            mu = (su_own >= o * gsz) & (su_own < (o + 1) * gsz)  # (eper,)
            mv = (sv_own >= o * gsz) & (sv_own < (o + 1) * gsz)
            iu = jnp.clip(su_own - o * gsz, 0, gsz - 1)
            iv = jnp.clip(sv_own - o * gsz, 0, gsz - 1)
            acc = acc + jnp.where(mu[:, None, None],
                                  jnp.take(vis, iu, axis=-3), 0.0)
            acc = acc + jnp.where(mv[:, None, None],
                                  jnp.take(vis, iv, axis=-3), 0.0)
            vis = jax.lax.ppermute(vis, axis, perm)
            return vis, acc

        acc0 = jnp.zeros(x_sh.shape[:-2] + (eper, H, F + 1), jnp.float32)
        _, zn_e = jax.lax.fori_loop(0, ndev, collect, (zn, acc0))

        out = zn_e[..., :F] / zn_e[..., F:]  # (..., eper, H, F)
        return out.reshape(out.shape[:-2] + (H * F,))

    return run(x)
