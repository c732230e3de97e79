"""Tensor-parallel FFN (Megatron-style column/row sharding).

SURVEY §2.3 marks tensor parallelism "optional / low priority" for this model
family — the shipped regret GNN is 1.19M params and always fits one chip.
This module provides the primitive anyway so the capability exists for wider
configurations (embed/hidden scaled up): the AttentionLayer FFN
(Linear(embed, hidden) -> ReLU -> Linear(hidden, embed), gnngls/models.py:28-34)
with the hidden dimension sharded over a mesh axis.

Layout (the classic Megatron MLP): ffn1 is column-parallel (each device owns
a hidden slice, no comm in), ReLU is local, ffn2 is row-parallel (partial
output sums), one psum over the axis at the end.  Exactly one collective per
FFN; activations of the hidden layer never materialize unsharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .linear import LinearParams


def shard_ffn_params(ffn1: LinearParams, ffn2: LinearParams, mesh: Mesh,
                     axis: str = "model"):
    """Place FFN params sharded: ffn1 column-parallel, ffn2 row-parallel."""
    from jax.sharding import NamedSharding

    ndev = mesh.shape[axis]
    if ffn1.w.shape[1] % ndev != 0:
        raise ValueError(f"hidden dim {ffn1.w.shape[1]} not divisible by "
                         f"{ndev} '{axis}' devices")
    f1 = LinearParams(
        w=jax.device_put(ffn1.w, NamedSharding(mesh, P(None, axis))),
        b=jax.device_put(ffn1.b, NamedSharding(mesh, P(axis))))
    f2 = LinearParams(
        w=jax.device_put(ffn2.w, NamedSharding(mesh, P(axis, None))),
        b=jax.device_put(ffn2.b, NamedSharding(mesh, P())))
    return f1, f2


def ffn_tp(ffn1: LinearParams, ffn2: LinearParams, x: jax.Array, mesh: Mesh,
           axis: str = "model") -> jax.Array:
    """x: (..., C) replicated -> (..., C) replicated; hidden dim sharded.

    Identical numerics to linear(ffn2, relu(linear(ffn1, x))) up to float
    summation order (tests assert allclose on the virtual mesh).
    """
    nb = x.ndim - 1
    xspec = P(*([None] * (nb + 1)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(xspec, P(None, axis), P(axis), P(axis, None), P()),
        out_specs=xspec,
    )
    def run(xs, w1, b1, w2, b2):
        a = jnp.maximum(
            jnp.einsum("...c,cd->...d", xs, w1,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST) + b1, 0.0)
        part = jnp.einsum("...d,de->...e", a, w2,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(part, axis) + b2

    return run(x, ffn1.w, ffn1.b, ffn2.w, ffn2.b)
