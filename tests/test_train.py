"""Training stack: torch checkpoint interop, losses, loop, checkpoints/resume."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnngls_tpu.core.graph import build_topology
from gnngls_tpu.data import dataset as ds, generate as gen, labels as lb
from gnngls_tpu.models import regret_gat as M, torch_import as ti
from gnngls_tpu.train import checkpoint as ckpt, loop as tl, step as ts


def tiny_sets(n=7, N=12, seed=0):
    data = gen.generate_instances(N, n, seed=seed)
    lb.compute_regret(data, method="held_karp")
    train_idx, val_idx, _ = ds.split_dataset(N, 8, 2, 2, seed=seed)
    tr = ds.TSPDataset.from_arrays(data, train_idx)
    tr.fit_scalers()
    va = ds.TSPDataset.from_arrays(data, val_idx, scalers=tr.scalers)
    return tr, va


def test_torch_state_dict_roundtrip():
    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=32, n_heads=4)
    params, state = M.init_params(jax.random.PRNGKey(0), cfg)
    sd = ti.state_dict_from_params(params, state)
    # reference key-naming contract
    assert "embed_layer.weight" in sd
    assert "message_passing_layers.0.message_passing.module.fc.weight" in sd
    assert "message_passing_layers.3.feed_forward.1.module.2.bias" in sd
    assert "decision_layer.bias" in sd

    p2, s2 = ti.params_from_state_dict(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_torch_import_numerics_against_numpy_forward():
    """Forward from the exported state dict in pure numpy (torch conventions)
    must match our jitted forward — validates every transpose in the mapping."""
    n, B = 6, 2
    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=16, n_heads=2)
    params, state = M.init_params(jax.random.PRNGKey(1), cfg)
    sd = {k: np.asarray(v) for k, v in ti.state_dict_from_params(params, state).items()}
    topo = build_topology(n)
    E = topo.n_edges
    x = np.random.default_rng(0).random((B, E, 1)).astype(np.float32)

    def np_linear(prefix, h):
        return h @ sd[f"{prefix}.weight"].T + sd[f"{prefix}.bias"]

    def np_bn_eval(prefix, h):
        mean, var = sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"]
        w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
        return (h - mean) / np.sqrt(var + 1e-5) * w + b

    def np_gat(mp, h):
        H = cfg.n_heads
        F = cfg.embed_dim // H
        fc = sd[f"{mp}.message_passing.module.fc.weight"]  # (H*F, C)
        al = sd[f"{mp}.message_passing.module.attn_l"][0]
        ar = sd[f"{mp}.message_passing.module.attn_r"][0]
        out = np.zeros_like(h)
        for b in range(h.shape[0]):
            z = (h[b] @ fc.T).reshape(E, H, F)
            el = (z * al).sum(-1)
            er = (z * ar).sum(-1)
            o = np.zeros((E, H, F), np.float32)
            for e in range(E):
                nb = topo.nbr[e]
                s = el[nb] + er[e]
                s = np.where(s > 0, s, 0.2 * s)
                a = np.exp(s - s.max(0))
                a = a / a.sum(0)
                o[e] = np.einsum("kh,khf->hf", a, z[nb])
            out[b] = o.reshape(E, -1)
        return out

    h = np_linear("embed_layer", x)
    for i in range(cfg.depth):
        mp = f"message_passing_layers.{i}"
        h = h + np_gat(mp, h)
        h = np_bn_eval(f"{mp}.feed_forward.0", h)
        h = h + np_linear(f"{mp}.feed_forward.1.module.2",
                          np.maximum(np_linear(f"{mp}.feed_forward.1.module.0", h), 0))
        h = np_bn_eval(f"{mp}.feed_forward.2", h)
    want = np_linear("decision_layer", h)

    got, _ = M.make_apply(cfg, n)(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_torch_pt_file_roundtrip(tmp_path):
    import torch

    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=16, n_heads=2)
    params, state = M.init_params(jax.random.PRNGKey(2), cfg)
    sd = ti.state_dict_from_params(params, state)
    torch.save({"epoch": 5, "model_state_dict": sd, "loss": 0.1, "val_loss": 0.2},
               tmp_path / "c.pt")
    p2, s2, meta = ti.load_checkpoint(tmp_path / "c.pt", cfg)
    assert meta["epoch"] == 5
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(40, 1)).astype(np.float32)
    target = (rng.random((40, 1)) < 0.2).astype(np.float32)
    pw = float(target.size / target.sum() - 1)
    want = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pw))(
        torch.tensor(logits), torch.tensor(target)).item()
    got = float(ts.bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(target), pw))
    assert abs(got - want) < 1e-6


def test_train_loop_smoke(tmp_path):
    tr, va = tiny_sets()
    cfg = tl.TrainConfig(embed_dim=16, n_heads=2, n_epochs=4, batch_size=4,
                         patience=10, seed=0)
    params, bn_state, hist = tl.train_model(tr, va, cfg, tmp_path / "run",
                                            verbose=False)
    assert len(hist) == 4
    assert hist[-1]["loss"] < hist[0]["loss"]  # learning happens
    assert (tmp_path / "run" / "checkpoint_best_val.npz").exists()
    assert (tmp_path / "run" / "checkpoint_final.npz").exists()
    assert json.load(open(tmp_path / "run" / "params.json"))["n_heads"] == 2

    # resume: load final checkpoint back into matching templates
    model_cfg = M.RegretGNNConfig(in_dim=1, embed_dim=16, n_heads=2)
    p_like, s_like = M.init_params(jax.random.PRNGKey(9), model_cfg)
    opt = ts.make_optimizer()
    o_like = opt.init(p_like)
    p2, s2, o2, meta = ckpt.load_checkpoint(
        tmp_path / "run" / "checkpoint_final.npz",
        params_like=p_like, bn_state_like=s_like, opt_state_like=o_like)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert o2 is not None


def test_train_bce_mode_smoke(tmp_path):
    tr, va = tiny_sets()
    cfg = tl.TrainConfig(embed_dim=16, n_heads=2, n_epochs=2, batch_size=4,
                         target="in_solution", seed=0)
    _, _, hist = tl.train_model(tr, va, cfg, tmp_path / "run2", verbose=False)
    assert np.isfinite([h["loss"] for h in hist]).all()
    # strict (non-bug) labels also train
    cfg2 = tl.TrainConfig(embed_dim=16, n_heads=2, n_epochs=2, batch_size=4,
                          target="in_solution", bug_compat_bce_target=False)
    _, _, hist2 = tl.train_model(tr, va, cfg2, tmp_path / "run3", verbose=False)
    assert np.isfinite([h["loss"] for h in hist2]).all()


def test_train_resume_continues(tmp_path):
    """resume_from restores state and continues the epoch count/lr schedule."""
    tr, va = tiny_sets()
    cfg = tl.TrainConfig(embed_dim=16, n_heads=2, n_epochs=2, batch_size=4,
                         seed=0, patience=50)
    tl.train_model(tr, va, cfg, tmp_path / "run", verbose=False)
    cfg2 = tl.TrainConfig(embed_dim=16, n_heads=2, n_epochs=4, batch_size=4,
                          seed=0, patience=50)
    _, _, hist = tl.train_model(
        tr, va, cfg2, tmp_path / "run2", verbose=False,
        resume_from=tmp_path / "run" / "checkpoint_final.npz")
    assert [h["epoch"] for h in hist] == [2, 3]
    assert hist[0]["lr"] == pytest.approx(cfg2.lr_init * cfg2.lr_decay ** 2)
