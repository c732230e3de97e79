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

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False

# Environment signals that indicate a multi-process launch.  Checked WITHOUT
# touching any JAX device API: jax.distributed.initialize must run before the
# local backend is instantiated (jax.devices()/process_count() would
# instantiate it and make the later initialize() raise).
_MULTIPROC_ENV = (
    "JAX_COORDINATOR_ADDRESS",      # explicit jax.distributed config
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_STEP_NODELIST",          # Slurm multi-node step
)


def _multiproc_env_signal() -> bool:
    if any(os.environ.get(k) for k in _MULTIPROC_ENV):
        return True
    # GCE TPU pod metadata lists every worker; a single entry (e.g. the
    # 'localhost' a single-chip tunnel sets) is NOT a multi-process launch.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([w for w in workers.split(",") if w.strip()]) > 1


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-host runtime (idempotent; no-op single-process).

    Must be called before any JAX device API (jax.devices(),
    jax.process_count(), array creation): jax.distributed.initialize refuses
    to run once the local backend exists.  Decides whether to initialize from
    explicit arguments or environment signals only — no JAX calls are made on
    the single-process path, so importing this module and calling
    ``initialize()`` is always safe.
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address is not None or num_processes is not None
    env_signal = _multiproc_env_signal()
    if not explicit and not env_signal:
        # single process with no coordinator configured: nothing to do, and
        # we deliberately avoid instantiating the backend here
        _initialized = True
        return
    if explicit:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        # no-arg auto-detect (TPU pod / Slurm); safe per jax.distributed docs
        jax.distributed.initialize()
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
    # The documented layout guarantee (model groups never straddle hosts, so
    # the per-layer all_gathers ride ICI, not DCN) holds iff each host's
    # device block tiles exactly into model groups — or one model group spans
    # a whole number of hosts (the multi-host-model case).
    if not (per_host % model_axis_size == 0 or
            (model_axis_size > per_host and model_axis_size % per_host == 0)):
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
