"""Regression tests for numerical failure modes found in integration runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.ops.gat import GATParams, gat_conv, gat_conv_chunked, gat_conv_naive


def _self_dominant_params(rng, n_heads=2, head_dim=4, in_dim=3):
    """Parameters where attn_l ~ attn_r, so each edge's self score (el + er)
    tends to dominate its group — the configuration that made the old
    subtract-self-after-softmax aggregation cancel to z ~ 0 and NaN."""
    hf = n_heads * head_dim
    a = rng.normal(size=(n_heads, head_dim)).astype(np.float32) * 4.0
    return GATParams(
        fc_w=jnp.asarray(rng.normal(size=(in_dim, hf)).astype(np.float32)),
        attn_l=jnp.asarray(a),
        attn_r=jnp.asarray(a + 1e-3 * rng.normal(size=a.shape).astype(np.float32)),
    )


@pytest.mark.parametrize("impl", ["fast", "chunked", "pallas"])
def test_gat_stable_under_self_dominant_scores(impl):
    """Training NaN regression: when an edge's self score dominates both of
    its groups, aggregation must stay finite and match the naive oracle
    (which never includes the self term at all)."""
    n, n_heads, head_dim, in_dim = 12, 2, 4, 3
    topo = build_topology(n)
    rng = np.random.default_rng(0)
    params = _self_dominant_params(rng, n_heads, head_dim, in_dim)
    # large-magnitude features amplify el + er so self scores exceed
    # cross scores by >> 1 unit on many edges
    x = jnp.asarray(8.0 * rng.normal(size=(topo.n_edges, in_dim)).astype(np.float32))

    ref = gat_conv_naive(params, topo, x, n_heads)
    assert np.isfinite(np.asarray(ref)).all()

    if impl == "fast":
        out = gat_conv(params, topo, x, n_heads)
    elif impl == "chunked":
        out = gat_conv_chunked(params, topo, x, n_heads, city_chunk=4)
    else:
        from gnngls_tpu.ops.pallas_gat import gat_conv_pallas

        out = gat_conv_pallas(params, topo, x, n_heads,
                              interpret=jax.default_backend() != "tpu")
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_gat_grad_stable_under_self_dominant_scores():
    """Gradients through the fast path stay finite in the same regime."""
    n, n_heads, head_dim, in_dim = 10, 2, 4, 3
    topo = build_topology(n)
    rng = np.random.default_rng(1)
    params = _self_dominant_params(rng, n_heads, head_dim, in_dim)
    x = jnp.asarray(8.0 * rng.normal(size=(topo.n_edges, in_dim)).astype(np.float32))

    def loss(p):
        return jnp.sum(gat_conv(p, topo, x, n_heads) ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_evaluate_pallas_engine_matches_xla():
    """evaluate(engine='pallas') (interpret off-TPU) returns the same best
    costs as the XLA engine on a weight-guided run."""
    from gnngls_tpu.data import generate, labels
    from gnngls_tpu.data.dataset import TSPDataset
    from gnngls_tpu.evaluate import evaluate

    data = generate.generate_instances(4, 10, seed=3)
    labels.compute_regret(data, method="native" if _native() else "gls",
                          n_iters=2, perturbation_moves=5)
    ds = TSPDataset.from_arrays(data)
    ds.fit_scalers()

    kw = dict(guides=["weight"], time_limit=None, n_iters=2,
              perturbation_moves=5)
    out_x = evaluate(ds, engine="xla", **kw)
    out_p = evaluate(ds, engine="pallas", **kw)
    np.testing.assert_allclose(out_p["best_costs"], out_x["best_costs"],
                               rtol=1e-5)
    with pytest.raises(ValueError):
        evaluate(ds, engine="pallas", guides=["weight"], time_limit=1.0,
                 n_iters=None)


def _native():
    from gnngls_tpu.data import native_oracle

    return native_oracle.available()


def test_gat_bf16_mode_close_to_f32():
    """'bf16' inference mode tracks the exact path to bf16-level noise."""
    from gnngls_tpu.models import regret_gat as M

    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=32, n_heads=4)
    params, state = M.init_params(jax.random.PRNGKey(0), cfg)
    n = 12
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, build_topology(n).n_edges, 1))
    y_exact, _ = M.make_apply(cfg, n, gat_impl="fast")(params, state, x)
    y_fast, _ = M.make_apply(cfg, n, gat_impl="bf16")(params, state, x)
    err = np.abs(np.asarray(y_fast) - np.asarray(y_exact))
    scale = np.abs(np.asarray(y_exact)).mean() + 1e-6
    assert (err / scale).max() < 5e-2


def test_nearest_neighbor_wide_batch_valid():
    """TPU miscompile regression: batched bool scatters inside scan corrupt
    the visited mask at vmap widths >= ~1024 (invalid repeated-city tours).
    nearest_neighbor now uses a one-hot OR; tours must be valid permutations
    at wide batch on every backend."""
    from gnngls_tpu.search import batched

    n, B = 12, 1300
    rng = np.random.default_rng(0)
    pos = rng.random((B, n, 2))
    Ds = jnp.asarray(np.linalg.norm(pos[:, :, None] - pos[:, None, :],
                                    axis=-1).astype(np.float32))
    tours = np.asarray(batched.nearest_neighbor_batch(Ds))
    assert tours.shape == (B, n + 1)
    srt = np.sort(tours[:, :-1], axis=1)
    assert (srt == np.arange(n)).all() and (tours[:, 0] == 0).all() \
        and (tours[:, -1] == 0).all()


def test_device_trace_writes_profile(tmp_path):
    from gnngls_tpu.utils.profiling import annotate, device_trace, step_annotation

    with device_trace(tmp_path):
        with annotate("gls-chunk"), step_annotation("step", 0):
            jnp.ones((8, 8)).sum().block_until_ready()
    assert any(tmp_path.rglob("*.pb")) or any(tmp_path.rglob("*.json.gz"))
