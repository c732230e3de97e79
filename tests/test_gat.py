"""GAT message-passing numerics.

Oracles:
  1. A from-scratch numpy implementation of DGL-0.6.1 GATConv math over the
     *networkx* line-graph adjacency (independent of our topology arrays).
  2. torch.nn cross-check of BatchNorm1d semantics.
The grouped (city-group/MXU) path must match the naive gather path, and both
must match the numpy oracle.
"""

import networkx as nx
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.ops import gat as gat_mod
from gnngls_tpu.ops.gat import GATParams, gat_conv, gat_conv_naive
from gnngls_tpu.ops.norm import BatchNormParams, BatchNormState, batch_norm


def numpy_gat_oracle(n, fc_w, attn_l, attn_r, x, n_heads):
    """DGL GATConv math over nx.line_graph(K_n) adjacency, pure numpy."""
    Kn = nx.complete_graph(n)
    lG = nx.line_graph(Kn)
    nodes = sorted(lG.nodes())  # (u, v) with u < v, lexicographic
    idx = {e: i for i, e in enumerate(nodes)}
    E = len(nodes)
    H = n_heads
    F = fc_w.shape[1] // H

    h = (x @ fc_w).reshape(E, H, F)
    el = (h * attn_l).sum(-1)  # (E, H)
    er = (h * attn_r).sum(-1)

    out = np.zeros((E, H, F))
    for e in nodes:
        i = idx[e]
        nbrs = [idx[tuple(sorted(nb))] for nb in lG.neighbors(e)]
        s = el[nbrs] + er[i][None, :]  # (K, H)
        s = np.where(s > 0, s, 0.2 * s)
        s = s - s.max(axis=0, keepdims=True)
        a = np.exp(s) / np.exp(s).sum(axis=0, keepdims=True)
        out[i] = np.einsum("kh,khf->hf", a, h[nbrs])
    return out.reshape(E, H * F)


@pytest.mark.parametrize("n,n_heads,head_dim", [(5, 2, 4), (8, 4, 8), (12, 8, 16)])
def test_gat_matches_numpy_oracle(n, n_heads, head_dim):
    topo = build_topology(n)
    E = topo.n_edges
    c_in = n_heads * head_dim  # same in/out so shapes are easy
    rng = np.random.default_rng(42)
    fc_w = rng.normal(size=(c_in, n_heads * head_dim)).astype(np.float32) * 0.3
    attn_l = rng.normal(size=(n_heads, head_dim)).astype(np.float32) * 0.3
    attn_r = rng.normal(size=(n_heads, head_dim)).astype(np.float32) * 0.3
    x = rng.normal(size=(E, c_in)).astype(np.float32)

    expected = numpy_gat_oracle(n, fc_w, attn_l, attn_r, x, n_heads)
    params = GATParams(jnp.asarray(fc_w), jnp.asarray(attn_l), jnp.asarray(attn_r))

    got_naive = np.asarray(gat_conv_naive(params, topo, jnp.asarray(x), n_heads))
    got_fast = np.asarray(gat_conv(params, topo, jnp.asarray(x), n_heads))

    np.testing.assert_allclose(got_naive, expected, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(got_fast, expected, rtol=1e-4, atol=2e-4)


def test_gat_fast_matches_naive_batched():
    n, n_heads, head_dim = 10, 8, 16
    topo = build_topology(n)
    key = jax.random.PRNGKey(0)
    c = n_heads * head_dim
    params = gat_mod.init_gat_params(key, c, n_heads, head_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, topo.n_edges, c))
    a = gat_conv_naive(params, topo, x, n_heads)
    b = gat_conv(params, topo, x, n_heads)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4)


def test_gat_grad_flows():
    n, n_heads, head_dim = 6, 2, 8
    topo = build_topology(n)
    c = n_heads * head_dim
    params = gat_mod.init_gat_params(jax.random.PRNGKey(0), c, n_heads, head_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (topo.n_edges, c))

    def loss(p):
        return jnp.sum(gat_conv(p, topo, x, n_heads) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree_util.tree_leaves(g))
    assert any(float(jnp.abs(leaf).sum()) > 0 for leaf in jax.tree_util.tree_leaves(g))


def test_batch_norm_matches_torch():
    import torch

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 45, 16)).astype(np.float32) * 2 + 1

    tbn = torch.nn.BatchNorm1d(16)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.normal(size=16).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.normal(size=16).astype(np.float32)))

    params = BatchNormParams(jnp.asarray(tbn.weight.detach().numpy()),
                             jnp.asarray(tbn.bias.detach().numpy()))
    state = BatchNormState(jnp.zeros(16), jnp.ones(16))

    # train mode: torch sees the flattened (B*E, C) node axis
    tbn.train()
    want = tbn(torch.tensor(x.reshape(-1, 16))).detach().numpy().reshape(x.shape)
    got, state = batch_norm(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.mean), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.var), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # a second train step accumulates running stats identically
    x2 = rng.normal(size=(4, 45, 16)).astype(np.float32)
    want2 = tbn(torch.tensor(x2.reshape(-1, 16))).detach().numpy().reshape(x2.shape)
    got2, state = batch_norm(params, state, jnp.asarray(x2), train=True)
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.mean), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.var), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # eval mode uses running stats
    tbn.eval()
    want3 = tbn(torch.tensor(x.reshape(-1, 16))).detach().numpy().reshape(x.shape)
    got3, _ = batch_norm(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got3), want3, rtol=1e-4, atol=1e-5)


def test_gat_chunked_matches_fast():
    from gnngls_tpu.ops.gat import gat_conv_chunked

    n, n_heads, head_dim = 16, 4, 8
    topo = build_topology(n)
    c = n_heads * head_dim
    params = gat_mod.init_gat_params(jax.random.PRNGKey(5), c, n_heads, head_dim)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, topo.n_edges, c))
    want = gat_conv(params, topo, x, n_heads)
    got = gat_conv_chunked(params, topo, x, n_heads, city_chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-4)
    # non-dividing chunk auto-adjusts to the largest divisor <= request
    got5 = gat_conv_chunked(params, topo, x, n_heads, city_chunk=5)
    np.testing.assert_allclose(np.asarray(got5), np.asarray(want), rtol=1e-4, atol=2e-4)
