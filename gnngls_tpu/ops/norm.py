"""BatchNorm with exact torch.nn.BatchNorm1d semantics.

The reference model normalizes over all line-graph nodes of a (dgl.batch'd)
mini-batch (gnngls/models.py:27,35 with train.py:118-120).  In our batched
layout the activations are (B, E, C); the node axis of the reference is the
flattened (B, E), so normalization reduces over every axis except the last.

Torch semantics reproduced here:
  * training: normalize with biased batch variance; update running stats with
    momentum 0.1, where running_var uses the *unbiased* variance.
  * eval: normalize with running stats.
  * eps = 1e-5.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


class BatchNormParams(NamedTuple):
    scale: jax.Array  # torch `weight`, (C,)
    bias: jax.Array  # torch `bias`, (C,)


class BatchNormState(NamedTuple):
    mean: jax.Array  # running_mean, (C,)
    var: jax.Array  # running_var, (C,)


def init_batch_norm(c: int, dtype=jnp.float32) -> Tuple[BatchNormParams, BatchNormState]:
    return (
        BatchNormParams(scale=jnp.ones((c,), dtype), bias=jnp.zeros((c,), dtype)),
        BatchNormState(mean=jnp.zeros((c,), dtype), var=jnp.ones((c,), dtype)),
    )


def batch_norm(
    params: BatchNormParams,
    state: BatchNormState,
    x: jax.Array,
    train: bool,
) -> Tuple[jax.Array, BatchNormState]:
    """x: (..., C).  Returns (normalized x, new running state)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = x.mean(axis=axes)
        var = x.var(axis=axes)  # biased, used for normalization
        count = x.size // x.shape[-1]
        unbiased = var * (count / max(count - 1, 1))
        new_state = BatchNormState(
            mean=(1 - MOMENTUM) * state.mean + MOMENTUM * mean,
            var=(1 - MOMENTUM) * state.var + MOMENTUM * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    inv = jax.lax.rsqrt(var + EPS)
    return (x - mean) * inv * params.scale + params.bias, new_state
