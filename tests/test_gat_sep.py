"""Separable (sorted-prefix-sum) GAT parity vs the naive gather oracle.

gat_conv_sep computes the exact same math as gat_conv_naive (DGL-0.6.1
GATConv over the K_n line graph, ops/gat.py header) via the rank-1 leaky
decomposition — these tests pin parity across sizes, batch dims, adversarial
score distributions (dominant self scores, near-ties, all-negative and
all-positive branches), and the bf16 fast mode's error envelope.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.ops.gat import GATParams, gat_conv, gat_conv_naive
from gnngls_tpu.ops.gat_sep import gat_conv_sep


def _params(rng, c_in, n_heads, head_dim, scale=0.3):
    return GATParams(
        fc_w=jnp.asarray(rng.normal(size=(c_in, n_heads * head_dim)) * scale,
                         jnp.float32),
        attn_l=jnp.asarray(rng.normal(size=(n_heads, head_dim)) * scale,
                           jnp.float32),
        attn_r=jnp.asarray(rng.normal(size=(n_heads, head_dim)) * scale,
                           jnp.float32),
    )


@pytest.mark.parametrize("n,n_heads,head_dim", [
    (4, 1, 4), (5, 2, 4), (8, 4, 8), (12, 8, 16), (20, 8, 16),
])
def test_sep_matches_naive(n, n_heads, head_dim):
    topo = build_topology(n)
    rng = np.random.default_rng(n)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    x = jnp.asarray(rng.normal(size=(topo.n_edges, c_in)), jnp.float32)
    ref = gat_conv_naive(params, topo, x, n_heads)
    out = gat_conv_sep(params, topo, x, n_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sep_batched_matches_naive():
    n, n_heads, head_dim = 10, 4, 8
    topo = build_topology(n)
    rng = np.random.default_rng(0)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    x = jnp.asarray(rng.normal(size=(3, 2, topo.n_edges, c_in)), jnp.float32)
    ref = gat_conv_naive(params, topo, x, n_heads)
    out = gat_conv_sep(params, topo, x, n_heads)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("scale", [3.0, 10.0])
def test_sep_extreme_score_spread(scale):
    """Large attention magnitudes: dominant self scores / argmax rows and
    saturated branches — the regimes the stability invariants target."""
    n, n_heads, head_dim = 9, 2, 8
    topo = build_topology(n)
    rng = np.random.default_rng(7)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim, scale=scale / head_dim)
    x = jnp.asarray(rng.normal(size=(topo.n_edges, c_in)) * 2.0, jnp.float32)
    ref = gat_conv_naive(params, topo, x, n_heads)
    out = gat_conv_sep(params, topo, x, n_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("shift", [-5.0, 5.0])
def test_sep_single_branch(shift):
    """Bias attn_r so every score lands in one leaky branch (all-positive or
    all-negative) — exercises empty prefix/suffix windows at pos=0 and pos=K."""
    n, n_heads, head_dim = 8, 2, 4
    topo = build_topology(n)
    rng = np.random.default_rng(3)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim, scale=0.05)
    # force er to a large constant of the chosen sign via a rank-1 attn_r
    params = params._replace(
        attn_r=params.attn_r + shift / (head_dim * 0.5))
    x = jnp.asarray(np.abs(rng.normal(size=(topo.n_edges, c_in))) * 0.5 + 0.5,
                    jnp.float32)
    ref = gat_conv_naive(params, topo, x, n_heads)
    out = gat_conv_sep(params, topo, x, n_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_sep_ties_in_el():
    """Exact ties in el (duplicated inputs): sort order is arbitrary among
    ties but the result must be tie-invariant."""
    n, n_heads, head_dim = 8, 2, 4
    topo = build_topology(n)
    rng = np.random.default_rng(5)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    base = rng.normal(size=(topo.n_edges, c_in)).astype(np.float32)
    base[1::2] = base[0::2][: base[1::2].shape[0]]  # duplicate rows -> el ties
    x = jnp.asarray(base)
    ref = gat_conv_naive(params, topo, x, n_heads)
    out = gat_conv_sep(params, topo, x, n_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sep_fast_mode_close():
    """bf16 fast mode error envelope is no worse than the established grouped
    fast path's (both measured against the f32 naive oracle) — i.e. the
    sorted-prefix machinery adds no cancellation noise of its own."""
    n, n_heads, head_dim = 16, 8, 16
    topo = build_topology(n)
    rng = np.random.default_rng(11)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    x = jnp.asarray(rng.normal(size=(2, topo.n_edges, c_in)), jnp.float32)
    exact = np.asarray(gat_conv_naive(params, topo, x, n_heads))

    def env(out):
        err = np.abs(np.asarray(out) - exact)
        rms = np.sqrt((err ** 2).mean()) / np.sqrt((exact ** 2).mean())
        return err.max(), rms

    ref_max, ref_rms = env(gat_conv(params, topo, x, n_heads, fast=True))
    sep_max, sep_rms = env(gat_conv_sep(params, topo, x, n_heads, fast=True))
    assert sep_rms < 1e-2  # documented fast-mode contract
    assert sep_rms < 1.5 * ref_rms + 1e-6
    assert sep_max < 1.5 * ref_max + 1e-6


def test_sep_gradients_match_naive():
    """The separable path is fully differentiable (sort/gather/threshold are
    a.e.-smooth) and its gradients match the naive oracle's to f32 noise —
    this is what licenses gat_impl='sep' as a TRAINING path."""
    n, n_heads, head_dim = 12, 4, 8
    topo = build_topology(n)
    rng = np.random.default_rng(0)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    x = jnp.asarray(rng.normal(size=(2, topo.n_edges, c_in)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(2, topo.n_edges, c_in)), jnp.float32)

    def loss(fn):
        return lambda p, x: jnp.sum(fn(p, topo, x, n_heads) * cot)

    g_ref = jax.grad(loss(gat_conv_naive), argnums=(0, 1))(params, x)
    g_sep = jax.grad(loss(gat_conv_sep), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sep)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 2e-5 * (np.abs(a).max() + 1e-6)


def test_sep_train_step_smoke():
    """One optimization step with gat_impl='sep' moves the loss like the
    default path does (training integration)."""
    from gnngls_tpu.models import regret_gat as M
    from gnngls_tpu.train.step import TrainState, make_optimizer, make_train_step

    n = 10
    cfg = M.RegretGNNConfig(in_dim=1, n_heads=2, embed_dim=16, hidden_dim=32)
    params, bn = M.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    state = TrainState(params, bn, opt.init(params))
    E = build_topology(n).n_edges
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, E, 1)), jnp.float32)
    y = jnp.asarray(rng.random((4, E, 1)), jnp.float32)
    losses = {}
    for impl in ("fast", "sep"):
        step, _ = make_train_step(cfg, n, opt, gat_impl=impl)
        s1, l1 = step(state, x, y)
        _, l2 = step(s1, x, y)
        losses[impl] = (float(l1), float(l2))
        assert float(l2) < float(l1)
    np.testing.assert_allclose(losses["sep"][0], losses["fast"][0], rtol=1e-4)


def test_sep_matches_grouped():
    """Cross-check against the city-group einsum path as well (same merge)."""
    n, n_heads, head_dim = 14, 4, 8
    topo = build_topology(n)
    rng = np.random.default_rng(13)
    c_in = n_heads * head_dim
    params = _params(rng, c_in, n_heads, head_dim)
    x = jnp.asarray(rng.normal(size=(topo.n_edges, c_in)), jnp.float32)
    ref = gat_conv(params, topo, x, n_heads)
    out = gat_conv_sep(params, topo, x, n_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
