"""Gradient quality of the TPU training path (VERDICT r1 weak item 5).

Training forwards with gat_impl='fast', whose aggregation einsum runs bf16
passes on TPU hardware (ops/gat.py NOTE).  Parity tests run on CPU where it
is exact f32 — so this script measures, ON TPU, the gradient error of the
fast path against the f32-exact naive gather path at a training-shaped
config, and reports per-leaf max relative error + global cosine similarity.

Usage: python benchmarks/grad_parity_tpu.py  (on the TPU host)
Writes benchmarks/GRAD_PARITY.json and prints a summary.
"""

import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.core.graph import build_topology
    from gnngls_tpu.models import regret_gat as M
    from gnngls_tpu.train.step import mse_loss

    n, B = 100, 4
    cfg = M.RegretGNNConfig()  # shipped 1.19M-param architecture
    topo = build_topology(n)
    params, bn_state = M.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, topo.n_edges, 1))
    y = jax.random.uniform(jax.random.PRNGKey(2), (B, topo.n_edges, 1))

    # The naive gather oracle materializes (B, E, 2(n-2), H, F) activations
    # (~8 GB at B=4, n=100 — exceeds one chip's HBM with backward temps), so
    # exact grads run per sample and are averaged (MSE-mean grads are the
    # mean of per-sample grads).  Train-mode BN statistics depend on the
    # batch, so the fast path is averaged the same per-sample way — both
    # sides see identical BN statistics and the comparison isolates the
    # aggregation-kernel numerics.
    def mean_grads(impl):
        def loss_fn(p, xb, yb):
            pred, _ = M.forward(p, bn_state, topo, xb, n_heads=cfg.n_heads,
                                train=True, gat_impl=impl)
            return mse_loss(pred, yb)

        grad_fn = jax.jit(jax.grad(loss_fn))
        per_sample = [grad_fn(params, x[i:i + 1], y[i:i + 1])
                      for i in range(B)]
        return jax.tree_util.tree_map(
            lambda *gs: sum(gs) / len(gs), *per_sample)

    g_fast = mean_grads("fast")
    g_exact = mean_grads("naive")
    jax.block_until_ready((g_fast, g_exact))

    paths_f = jax.tree_util.tree_flatten_with_path(g_fast)[0]
    flat_e, _ = jax.tree_util.tree_flatten(g_exact)
    dot = nf = ne = 0.0
    worst, worst_leaf, worst_leaf_cos = 0.0, None, None
    per_leaf = {}
    for (path, a), b in zip(paths_f, flat_e):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-30
        rel = np.abs(a - b).max() / scale
        leaf_cos = float((a * b).sum()
                         / (np.sqrt((a * a).sum() * (b * b).sum()) + 1e-30))
        per_leaf[name] = {"max_rel_err": float(rel), "cosine": leaf_cos,
                          "size": int(a.size)}
        if rel > worst:
            worst, worst_leaf, worst_leaf_cos = rel, name, leaf_cos
        dot += float((a * b).sum())
        nf += float((a * a).sum())
        ne += float((b * b).sum())
    cos = dot / np.sqrt(nf * ne)
    out = {
        "backend": jax.default_backend(),
        "config": "tsp100, B=4, shipped architecture, train-mode BN",
        "max_rel_err_any_leaf": float(worst),
        # which leaf fails and whether its own direction is still right —
        # a low per-leaf cosine would mean bf16 noise could skew training
        # even with a near-1 global cosine (ADVICE r3)
        "worst_leaf": worst_leaf,
        "worst_leaf_cosine": worst_leaf_cos,
        "per_leaf": per_leaf,
        "grad_cosine_similarity": float(cos),
    }
    print(json.dumps(out, indent=2))
    (ROOT / "benchmarks" / "GRAD_PARITY.json").write_text(
        json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
