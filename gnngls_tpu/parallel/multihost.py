"""Multi-host runtime: process bring-up and host-spanning meshes.

The reference has no distributed layer at all (SURVEY §2.3); this module is
the new framework's multi-host story.  Design:

  * one JAX process per host, connected with ``jax.distributed.initialize``
    (DCN control plane; data plane is ICI within a slice, DCN across slices);
  * a host-spanning mesh laid out so the *inner* (fast, ICI) axis carries the
    model/city-sharded collectives of ops/gat_sharded (two all_gathers per
    layer) and the *outer* (DCN) axis carries only data parallelism — one
    gradient psum per step, amortized over the whole batch;
  * per-host data loading: each process feeds only its own shard of the
    instance batch (``host_local_batch_slice``), then arrays are assembled
    with ``jax.make_array_from_process_local_data``.

Single-host meshes (the testable configuration here: one real chip, or an
8-device virtual CPU platform) fall out as the trivial case — the same code
paths run unchanged, which is what the test suite and the driver's
``dryrun_multichip`` exercise.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-host runtime (idempotent; no-op single-process).

    With no arguments, auto-detects the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS et al.), matching jax.distributed semantics.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    if coordinator_address is None and num_processes is None:
        # single process with no coordinator configured: nothing to do
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def make_host_mesh(model_axis_size: int = 1,
                   axes: Sequence[str] = ("data", "model")) -> Mesh:
    """Host-spanning mesh: 'model' (city-sharded GAT collectives) packed on
    the ICI-contiguous inner axis, 'data' spanning the rest (and DCN).

    jax.devices() orders devices host-major, so reshaping to
    (n_total // model, model) keeps each model group within one host's ICI
    domain whenever model_axis_size divides the per-host device count.
    """
    devs = np.asarray(jax.devices())
    n = devs.size
    if n % model_axis_size != 0:
        raise ValueError(f"{n} devices not divisible by model={model_axis_size}")
    per_host = n // jax.process_count()
    if model_axis_size > per_host and model_axis_size % per_host != 0:
        raise ValueError(
            f"model axis {model_axis_size} would straddle hosts unevenly "
            f"({per_host} devices/host)")
    return Mesh(devs.reshape(n // model_axis_size, model_axis_size), axes)


def host_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """[start, stop) of this process's share of a globally-sharded batch."""
    per = global_batch // jax.process_count()
    if per * jax.process_count() != global_batch:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{jax.process_count()} processes")
    i = jax.process_index()
    return i * per, (i + 1) * per


def global_array_from_host_shards(mesh: Mesh, spec, host_local: np.ndarray):
    """Assemble a global jax.Array from per-process local shards."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), host_local)
