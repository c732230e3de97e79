"""Device-mesh helpers.

The reference is single-device (SURVEY §2.3: no distributed layer exists).
This framework scales with jax.sharding over a named mesh:
  * axis "data": instances (training batches, GLS populations) — the dominant
    parallelism for this model family (1.2M params, huge instance batches);
  * axis "model" (reserved): edge-partitioned message passing for tsp500+
    line graphs (O(n^2) nodes), where neighbor-group matmuls shard by city.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              model_axis_size: Optional[int] = None) -> Mesh:
    """Single-process mesh over the first `n_devices` devices.

    For 2-axis meshes the second axis gets `model_axis_size` devices
    (default: the largest power of two ≤ sqrt(n), i.e. a balanced split);
    the first axis takes the rest.  Multi-host layouts belong to
    multihost.make_host_mesh, which additionally guarantees ICI locality.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axes) == 1:
        shape = (n,)
    elif len(axes) == 2:
        model = model_axis_size
        if model is None:
            model = 1
            while n % (model * 2) == 0 and (model * 2) ** 2 <= n:
                model *= 2
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        shape = (n // model, model)
    else:
        raise ValueError("1 or 2 mesh axes supported")
    return Mesh(np.asarray(devs).reshape(shape), axes)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
