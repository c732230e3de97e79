"""Threshold-mask Pallas separable GAT vs the naive oracle (interpret mode).

The kernel builds the (K, K) branch indicators in VMEM from the rank-1
broadcast el_j + er_i and consumes them in masked MXU matmuls — no score
tensor, no sort, no multi-axis gathers (the things that sank the XLA sep
path on TPU, RESULTS_north_star.md).  These tests pin its math to the
naive gather oracle on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.models import regret_gat as M
from gnngls_tpu.ops.gat import GATParams, gat_conv_naive
from gnngls_tpu.ops.pallas_gat_sep import gat_conv_pallas_sep


def _params(rng, c_in, n_heads, head_dim, scale=0.3):
    return GATParams(
        fc_w=jnp.asarray(rng.normal(size=(c_in, n_heads * head_dim)) * scale,
                         jnp.float32),
        attn_l=jnp.asarray(rng.normal(size=(n_heads, head_dim)) * scale,
                           jnp.float32),
        attn_r=jnp.asarray(rng.normal(size=(n_heads, head_dim)) * scale,
                           jnp.float32),
    )


@pytest.mark.parametrize("n,n_heads,head_dim,scale", [
    (8, 2, 4, 0.3),
    (12, 4, 8, 0.3),
    (9, 2, 8, 1.25),   # wide logit spread: exercises the B_i envelope
    (10, 8, 16, 0.1),  # shipped head count
])
def test_pallas_sep_matches_naive(n, n_heads, head_dim, scale):
    topo = build_topology(n)
    rng = np.random.default_rng(n)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim, scale)
    x = jnp.asarray(rng.normal(size=(2, topo.n_edges, c_in)), jnp.float32)
    ref = np.asarray(gat_conv_naive(params, topo, x, n_heads))
    out = np.asarray(gat_conv_pallas_sep(params, topo, x, n_heads,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_pallas_sep_group_chunk_nondivisor():
    """group_chunk falls back to a divisor of n."""
    n, n_heads, head_dim = 7, 2, 4
    topo = build_topology(n)
    rng = np.random.default_rng(1)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    x = jnp.asarray(rng.normal(size=(topo.n_edges, c_in)), jnp.float32)
    ref = np.asarray(gat_conv_naive(params, topo, x, n_heads))
    out = np.asarray(gat_conv_pallas_sep(params, topo, x, n_heads,
                                         group_chunk=4, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_pallas_sep_full_model_forward():
    """Wired as gat_impl='pallas_sep' through the whole model."""
    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=16, n_heads=2, hidden_dim=32)
    n = 8
    params, state = M.init_params(jax.random.PRNGKey(0), cfg)
    topo = build_topology(n)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, topo.n_edges, 1))
    y_ref, _ = M.forward(params, state, topo, x, n_heads=cfg.n_heads,
                         gat_impl="naive")
    y, _ = M.forward(params, state, topo, x, n_heads=cfg.n_heads,
                     gat_impl="pallas_sep")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

def test_pallas_sep_constant_features_finite():
    """Tied group maxima (constant edge features) must not overflow.

    Regression (round-5 ADVICE): M2 masked ALL elements tied at the group
    max, so constant rows got M2 = -3e38 and B/D = exp(er + M - m)
    overflowed to inf/NaN.  The fix masks exactly the first argmax
    occurrence, as the XLA sep path does."""
    n, n_heads, head_dim = 8, 2, 4
    topo = build_topology(n)
    rng = np.random.default_rng(7)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    x = jnp.ones((topo.n_edges, c_in), jnp.float32)  # constant -> tied logits
    out = np.asarray(gat_conv_pallas_sep(params, topo, x, n_heads,
                                         interpret=True))
    assert np.isfinite(out).all()
    ref = np.asarray(gat_conv_naive(params, topo, x, n_heads))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)
