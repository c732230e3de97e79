"""Pallas fused GAT kernel vs the XLA paths (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.models import regret_gat as M
from gnngls_tpu.ops import gat as gm
from gnngls_tpu.ops.pallas_gat import gat_conv_pallas


@pytest.mark.parametrize("n,H,F", [(6, 2, 8), (10, 4, 8), (16, 8, 16)])
def test_pallas_gat_matches_fast(n, H, F):
    topo = build_topology(n)
    c = H * F
    params = gm.init_gat_params(jax.random.PRNGKey(0), c, H, F)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, topo.n_edges, c))
    want = gm.gat_conv(params, topo, x, H)
    got = gat_conv_pallas(params, topo, x, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,sc", [(12, 4), (16, 5), (24, 8)])
def test_pallas_gat_source_chunked(n, sc):
    """Large-n variant: sources streamed in VMEM-sized chunks with flash
    max-merging (incl. non-divisible chunk -> -inf padded lanes)."""
    topo = build_topology(n)
    H, F, c = 4, 8, 6
    params = gm.init_gat_params(jax.random.PRNGKey(4), c, H, F)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, topo.n_edges, c))
    want = gm.gat_conv(params, topo, x, H)
    got = gat_conv_pallas(params, topo, x, H, interpret=True, src_chunk=sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [10, 16])
def test_pallas_gat_mxu_variant(n):
    """Per-head MXU aggregation variant == the lane-replicated kernel."""
    topo = build_topology(n)
    H, F, c = 4, 8, 6
    params = gm.init_gat_params(jax.random.PRNGKey(6), c, H, F)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, topo.n_edges, c))
    want = gm.gat_conv(params, topo, x, H)
    got = gat_conv_pallas(params, topo, x, H, interpret=True, mxu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_gat_unbatched_input():
    n, H, F = 8, 2, 8
    topo = build_topology(n)
    params = gm.init_gat_params(jax.random.PRNGKey(2), H * F, H, F)
    x = jax.random.normal(jax.random.PRNGKey(3), (topo.n_edges, H * F))
    want = gm.gat_conv(params, topo, x, H)
    got = gat_conv_pallas(params, topo, x, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_model_forward_gat_impls_agree():
    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=16, n_heads=2)
    params, state = M.init_params(jax.random.PRNGKey(0), cfg)
    n = 9
    topo = build_topology(n)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, topo.n_edges, 1))
    outs = {}
    for impl in ("fast", "naive"):
        y, _ = M.forward(params, state, topo, x, n_heads=2, gat_impl=impl)
        outs[impl] = np.asarray(y)
    np.testing.assert_allclose(outs["fast"], outs["naive"], rtol=1e-4, atol=1e-4)
