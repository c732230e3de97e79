"""Mesh-sharded GLS evaluation: instances sharded over the 'data' axis.

Search is embarrassingly parallel across instances (each GLS trajectory is
independent), so eval throughput scales linearly with chips: the vmapped
batch axis is simply sharded and no collectives are needed.  This is where
most TPU throughput comes from for this workload (SURVEY §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..search import batched, local_search as ls
from .mesh import data_sharding


def make_sharded_gls(mesh: Mesh, *, n_iters: int, perturbation_moves: int = 20,
                     trace_cap: int = 1024):
    """Returns run(Ds, guide_stack, init_tours) with all batch axes sharded."""

    def run(Ds, guide_stack, init_tours):
        def one(D, guides, t):
            state = ls.gls_init(D, t, trace_cap=trace_cap)

            def body(_, s):
                return ls.gls_iteration(s, D, guides,
                                        perturbation_moves=perturbation_moves)

            out = jax.lax.fori_loop(0, n_iters, body, state)
            return out.best_tour, out.best_cost, out.trace.n

        return jax.vmap(one)(Ds, guide_stack, init_tours)

    sh3 = data_sharding(mesh, 3)
    sh4 = data_sharding(mesh, 4)
    sh2 = data_sharding(mesh, 2)
    return jax.jit(run, in_shardings=(sh3, sh4, sh2),
                   out_shardings=(sh2, data_sharding(mesh, 1),
                                  data_sharding(mesh, 1)))
