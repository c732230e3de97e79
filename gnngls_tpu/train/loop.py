"""Training loop: epochs, early stopping, checkpoints, metrics logging.

Mirrors scripts/train.py:70-170 behavior:
  * shuffled mini-batches of scaled features/targets;
  * Adam(lr_init), lr *= lr_decay per epoch (ExponentialLR, train.py:161);
  * early stopping on "validation" loss with min_delta/patience
    (train.py:79-80,145-158) — reference quirk: the monitored loss is an eval
    pass over the TRAIN set (train.py:137); reproduce via
    ``val_on_train=True`` (default, checkpoint-compatible) or monitor the
    real val set with ``val_on_train=False``;
  * checkpoint triad: checkpoint_best_val, optional periodic, checkpoint_final
    (train.py:145-158,170), plus params.json of the run config;
  * scalar metrics appended to metrics.jsonl (stand-in for TensorBoard
    scalars Loss/train, Loss/validation, train.py:126,135,138).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import TSPDataset
from ..models import regret_gat as M
from . import checkpoint as ckpt
from .step import TrainState, make_optimizer, make_train_step, set_lr


@dataclasses.dataclass
class TrainConfig:
    embed_dim: int = 128
    n_layers: int = 3
    n_heads: int = 8
    lr_init: float = 1e-3
    lr_decay: float = 0.99
    min_delta: float = 1e-4
    patience: int = 20
    batch_size: int = 32
    n_epochs: int = 100
    checkpoint_freq: Optional[int] = None
    target: str = "regret"  # or 'in_solution'
    seed: int = 0
    val_on_train: bool = True  # reference quirk train.py:137
    bug_compat_bce_target: bool = True  # datasets.py:94 quirk
    depth_from_heads: bool = True  # models.py:60 quirk
    gat_impl: str = "fast"  # attention path; 'sep' = O(n^2) separable
    # Crash-envelope bouts (CRASH_ENVELOPE.md): stop after this many epochs
    # IN THIS CALL, persist a periodic checkpoint, and return WITHOUT
    # writing checkpoint_final — callers treat the missing final as
    # "incomplete, relaunch with resume_from".
    max_epochs_per_call: Optional[int] = None

    def to_params_json(self) -> dict:
        """Reference-style params.json payload (train.py:165-168)."""
        d = dataclasses.asdict(self)
        return d


def _batches(N, batch_size, rng):
    idx = rng.permutation(N)
    for s in range(0, N, batch_size):
        yield idx[s:s + batch_size]


def train_model(train_set: TSPDataset, val_set: TSPDataset, cfg: TrainConfig,
                run_dir, *, verbose: bool = True, resume_from=None):
    """Train the regret model; returns (params, bn_state, history).

    resume_from: path to a checkpoint .npz — restores params, BN state,
    optimizer state and continues from the saved epoch with the lr schedule
    advanced accordingly (the reference can only save, SURVEY §5; the
    early-stopping patience counter restarts on resume).
    """
    run_dir = pathlib.Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)

    n = train_set.n_nodes
    model_cfg = M.RegretGNNConfig(
        in_dim=train_set.feat_dim, embed_dim=cfg.embed_dim, out_dim=1,
        n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        depth_from_heads=cfg.depth_from_heads)

    key = jax.random.PRNGKey(cfg.seed)
    params, bn_state = M.init_params(key, model_cfg)
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    state = TrainState(params, bn_state, opt_state)

    if cfg.target == "regret":
        target_key, pos_weight = "regret", 1.0
    else:
        # pos_weight = len(y)/y.sum() - 1 on the first instance (train.py:111-115)
        y0 = (train_set.get_scaled_batch([0])["regret_unscaled"]
              if cfg.bug_compat_bce_target else
              train_set.get_scaled_batch([0])["in_solution"])
        pos_weight = float(y0.size / y0.sum() - 1.0)
        target_key = "regret_unscaled" if cfg.bug_compat_bce_target else "in_solution"

    train_step, eval_step = make_train_step(
        model_cfg, n, optimizer, target=cfg.target, pos_weight=pos_weight,
        gat_impl=cfg.gat_impl)

    with open(run_dir / "params.json", "w") as f:
        json.dump(cfg.to_params_json(), f, indent=2)

    rng = np.random.default_rng(cfg.seed)
    history = []
    best_score, counter = None, 0
    lr = cfg.lr_init
    start_epoch = 0
    if resume_from is not None:
        p2, s2, o2, meta = ckpt.load_checkpoint(
            resume_from, params_like=state.params,
            bn_state_like=state.bn_state, opt_state_like=state.opt_state)
        state = TrainState(p2, s2, o2 if o2 is not None else state.opt_state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        lr = cfg.lr_init * cfg.lr_decay ** start_epoch
        if verbose:
            print(f"resumed from {resume_from} at epoch {start_epoch}")
    metrics_f = open(run_dir / "metrics.jsonl", "a")

    monitored_set = train_set if cfg.val_on_train else val_set

    epoch = start_epoch
    for epoch in range(start_epoch, cfg.n_epochs):
        state = state._replace(opt_state=set_lr(state.opt_state, lr))
        t0 = time.time()
        losses = []
        for bidx in _batches(len(train_set), cfg.batch_size, rng):
            batch = train_set.get_scaled_batch(bidx)
            state, loss = train_step(state, jnp.asarray(batch["features"]),
                                     jnp.asarray(batch[target_key]))
            losses.append(float(loss))
        epoch_loss = float(np.mean(losses))

        val_losses = []
        for bidx in _batches(len(monitored_set), cfg.batch_size,
                             np.random.default_rng(0)):
            batch = monitored_set.get_scaled_batch(bidx)
            val_losses.append(float(eval_step(state, jnp.asarray(batch["features"]),
                                              jnp.asarray(batch[target_key]))))
        epoch_val_loss = float(np.mean(val_losses))

        row = {"epoch": epoch, "loss": epoch_loss, "val_loss": epoch_val_loss,
               "lr": lr, "time": time.time() - t0}
        history.append(row)
        metrics_f.write(json.dumps(row) + "\n")
        metrics_f.flush()
        if verbose:
            print(f"epoch {epoch}: train {epoch_loss:.6f} val {epoch_val_loss:.6f} "
                  f"lr {lr:.2e} ({row['time']:.1f}s)")

        if cfg.checkpoint_freq is not None and epoch > 0 and epoch % cfg.checkpoint_freq == 0:
            ckpt.save_checkpoint(run_dir / f"checkpoint_{epoch}.npz",
                                 params=state.params, bn_state=state.bn_state,
                                 opt_state=state.opt_state, epoch=epoch,
                                 loss=epoch_loss, val_loss=epoch_val_loss)

        if best_score is None or epoch_val_loss < best_score - cfg.min_delta:
            ckpt.save_checkpoint(run_dir / "checkpoint_best_val.npz",
                                 params=state.params, bn_state=state.bn_state,
                                 opt_state=state.opt_state, epoch=epoch,
                                 loss=epoch_loss, val_loss=epoch_val_loss)
            best_score, counter = epoch_val_loss, 0
        else:
            counter += 1
        if counter >= cfg.patience:
            break

        lr *= cfg.lr_decay

        if (cfg.max_epochs_per_call is not None
                and epoch - start_epoch + 1 >= cfg.max_epochs_per_call
                and epoch < cfg.n_epochs - 1):
            ckpt.save_checkpoint(run_dir / f"checkpoint_{epoch}.npz",
                                 params=state.params,
                                 bn_state=state.bn_state,
                                 opt_state=state.opt_state, epoch=epoch,
                                 loss=epoch_loss, val_loss=epoch_val_loss)
            metrics_f.close()
            if verbose:
                print(f"bout bound: stopping after epoch {epoch} "
                      f"(no final checkpoint — resume to continue)",
                      flush=True)
            return state.params, state.bn_state, history

    ckpt.save_checkpoint(run_dir / "checkpoint_final.npz",
                         params=state.params, bn_state=state.bn_state,
                         opt_state=state.opt_state, epoch=epoch,
                         loss=history[-1]["loss"] if history else None,
                         val_loss=history[-1]["val_loss"] if history else None)
    metrics_f.close()
    return state.params, state.bn_state, history
