"""Data-parallel training over a device mesh.

jit + sharding annotations (not shard_map): the batch axis is sharded over
mesh axis "data", parameters are replicated, and XLA inserts the gradient
all-reduce (psum over ICI) during sharding propagation.  BatchNorm statistics
are means over the *global* batch axis, so the compiler lowers them to
cross-replica reductions automatically — semantics match the single-device
program (up to float reduction order), with zero hand-written collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..models import regret_gat as M
from ..train.step import make_train_fns
from .mesh import data_sharding, replicated


def make_dp_train_step(cfg: M.RegretGNNConfig, n: int, optimizer, mesh: Mesh, *,
                       target: str = "regret", pos_weight: float = 1.0):
    """(train_step, eval_step) jitted with data-parallel shardings."""
    train_fn, eval_fn = make_train_fns(cfg, n, optimizer, target=target,
                                       pos_weight=pos_weight)
    rep = replicated(mesh)
    xsh = data_sharding(mesh, 3)

    train_step = jax.jit(train_fn, in_shardings=(rep, xsh, xsh),
                         out_shardings=(rep, rep))
    eval_step = jax.jit(eval_fn, in_shardings=(rep, xsh, xsh),
                        out_shardings=rep)
    return train_step, eval_step


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device_put a host batch with the leading axis sharded over 'data'."""
    return {k: jax.device_put(v, data_sharding(mesh, v.ndim))
            for k, v in batch.items()}
