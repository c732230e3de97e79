"""Memory-sharded ring GAT vs the single-device city-group path.

The ring path (ops/gat_ring.py) keeps edge activations sharded and streams
shards/partials with ppermute; it must be numerically identical (up to float
addition order) to ops.gat.gat_conv.  Runs on the 8-device virtual CPU mesh
(SURVEY §4.4 distributed-test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.ops import gat, gat_ring


def make_mesh(ndev, axis="model"):
    return Mesh(np.array(jax.devices("cpu")[:ndev]), (axis,))


@pytest.mark.parametrize("n,ndev,batch", [(16, 8, ()), (16, 4, (3,)),
                                          (24, 8, (2,))])
def test_ring_matches_gat_conv(n, ndev, batch):
    topo = build_topology(n)
    H, F, C = 4, 8, 5
    key = jax.random.PRNGKey(0)
    params = gat.init_gat_params(key, C, H, F)
    x = jax.random.normal(jax.random.PRNGKey(1), batch + (topo.n_edges, C))

    ref = gat.gat_conv(params, topo, x, H)

    mesh = make_mesh(ndev)
    xp = gat_ring.ring_pad(x, ndev)
    xp = jax.device_put(xp, gat_ring.edge_sharding(mesh, xp.ndim))
    out = jax.jit(lambda a: gat_ring.gat_conv_ring(
        params, topo, a, H, mesh, city_chunk=2))(xp)
    # output stays edge-sharded: per-device memory is 1/ndev of E-space
    assert out.sharding.spec == NamedSharding(mesh, P(
        *([None] * len(batch)), "model", None)).spec
    out = gat_ring.ring_unpad(np.asarray(out), topo.n_edges)

    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_full_model_ring_matches_forward():
    """Whole-model memory-sharded inference == single-device forward."""
    from gnngls_tpu.models import regret_gat as M

    n, ndev = 16, 8
    topo = build_topology(n)
    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=16, n_heads=4, n_layers=2,
                            hidden_dim=32, depth_from_heads=False)
    params, state = M.init_params(jax.random.PRNGKey(2), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (topo.n_edges, 1))

    ref, _ = M.forward(params, state, topo, x, n_heads=cfg.n_heads,
                       train=False, gat_impl="fast")

    mesh = make_mesh(ndev)
    xp = gat_ring.ring_pad(x, ndev)
    xp = jax.device_put(xp, gat_ring.edge_sharding(mesh, xp.ndim))
    out = jax.jit(lambda a: M.forward_ring(
        params, state, topo, a, n_heads=cfg.n_heads, mesh=mesh,
        city_chunk=2))(xp)
    out = gat_ring.ring_unpad(np.asarray(out), topo.n_edges)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_ring_pad_roundtrip():
    E = 120  # n=16 -> not divisible by 7... use ndev=7 to force padding
    x = np.arange(E * 3, dtype=np.float32).reshape(E, 3)
    xp = gat_ring.ring_pad(x, 7)
    assert xp.shape[0] == gat_ring.padded_edges(E, 7) == 126
    np.testing.assert_array_equal(gat_ring.ring_unpad(xp, E), x)
