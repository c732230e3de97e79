"""Dense layers with torch.nn.Linear-compatible initialization."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LinearParams(NamedTuple):
    w: jax.Array  # (C_in, C_out)
    b: jax.Array  # (C_out,)


def init_linear(key, c_in: int, c_out: int, dtype=jnp.float32) -> LinearParams:
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on the weight
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); the bias uses the same bound."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(c_in)
    w = jax.random.uniform(kw, (c_in, c_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (c_out,), minval=-bound, maxval=bound)
    return LinearParams(w=w.astype(dtype), b=b.astype(dtype))


def linear(params: LinearParams, x: jax.Array) -> jax.Array:
    # HIGHEST precision: TPU f32 einsums otherwise round through bf16, which
    # breaks reference-checkpoint parity (see ops/gat.py PRECISION note).
    return jnp.einsum("...c,cd->...d", x, params.w,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) + params.b
