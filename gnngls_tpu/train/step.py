"""Jitted train/eval steps and the optimizer.

Reference training (scripts/train.py:20-57,106-116): Adam(lr_init) with
per-epoch ExponentialLR(lr_decay); loss = MSE on min-max-scaled regret
(target='regret'), or BCEWithLogits with pos_weight = len(y)/y.sum() - 1 on
target='in_solution'.  Reference quirk reproduced behind ``bug_compat``: the
'in_solution' tensor actually holds unscaled regret (gnngls/datasets.py:94),
so the shipped BCE mode trains against regret values; strict mode uses the
real boolean labels.

The optimizer is optax Adam (same update rule and defaults as torch.optim.Adam:
b1=0.9, b2=0.999, eps=1e-8); the LR is injected per-epoch by the loop, exactly
mirroring torch's scheduler.step() per epoch (train.py:161).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core.graph import build_topology
from ..models import regret_gat as M


class TrainState(NamedTuple):
    params: M.RegretGNNParams
    bn_state: M.RegretGNNState
    opt_state: optax.OptState


def make_optimizer():
    """Adam with an injected learning rate (set per epoch by the loop)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def bce_with_logits_loss(pred, target, pos_weight):
    """torch BCEWithLogitsLoss with pos_weight, mean reduction."""
    log_sig = jax.nn.log_sigmoid(pred)
    log_sig_neg = jax.nn.log_sigmoid(-pred)
    losses = -(pos_weight * target * log_sig + (1.0 - target) * log_sig_neg)
    return jnp.mean(losses)


def make_train_fns(cfg: M.RegretGNNConfig, n: int, optimizer, *,
                   target: str = "regret", pos_weight: float = 1.0,
                   gat_impl: str = "fast"):
    """Raw (un-jitted) train/eval step functions over (B, E, .) batches.

    Callers jit these — plainly (make_train_step) or with device-mesh
    shardings (parallel.train_dp).  gat_impl selects the attention path
    (models.forward); 'sep' / 'sep_fast' use the O(n^2) separable
    formulation (exact gradients, tests/test_gat_sep.py)."""
    topo = build_topology(n)

    def loss_fn(params, bn_state, x, y, train: bool):
        pred, new_bn = M.forward(params, bn_state, topo, x,
                                 n_heads=cfg.n_heads, train=train,
                                 gat_impl=gat_impl)
        if target == "regret":
            loss = mse_loss(pred, y)
        else:
            loss = bce_with_logits_loss(pred, y, pos_weight)
        return loss, new_bn

    def train_step(state: TrainState, x, y):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.bn_state, x, y, True)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt), loss

    def eval_step(state: TrainState, x, y):
        loss, _ = loss_fn(state.params, state.bn_state, x, y, False)
        return loss

    return train_step, eval_step


def make_train_step(cfg: M.RegretGNNConfig, n: int, optimizer, *,
                    target: str = "regret", pos_weight: float = 1.0,
                    gat_impl: str = "fast"):
    """Jitted single-device (train_step, eval_step)."""
    train_fn, eval_fn = make_train_fns(cfg, n, optimizer, target=target,
                                       pos_weight=pos_weight,
                                       gat_impl=gat_impl)
    return jax.jit(train_fn), jax.jit(eval_fn)


def set_lr(opt_state, lr: float):
    """Per-epoch learning-rate injection (ExponentialLR semantics)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
