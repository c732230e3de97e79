"""Multi-host runtime helpers on the 8-device virtual platform.

True multi-process DCN bring-up needs real hosts; here we validate the
single-process degenerate case plus the mesh-layout / batch-slicing /
global-array logic the multi-host path shares (SURVEY §2.3: all of this is
NEW capability — the reference is single-device)."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from gnngls_tpu.parallel import multihost as mh


def test_initialize_single_process_noop():
    mh.initialize()  # must not raise or hang without a coordinator
    assert jax.process_count() == 1


def test_make_host_mesh_layouts():
    mesh = mh.make_host_mesh(model_axis_size=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 == len(jax.devices())
    with pytest.raises(ValueError):
        mh.make_host_mesh(model_axis_size=3)  # 8 % 3 != 0


def test_host_local_batch_slice():
    lo, hi = mh.host_local_batch_slice(32)
    assert (lo, hi) == (0, 32)  # single process owns everything


def test_global_array_roundtrip():
    mesh = mh.make_host_mesh(model_axis_size=1)
    x = np.arange(48, dtype=np.float32).reshape(8, 6)
    arr = mh.global_array_from_host_shards(mesh, P("data", None), x)
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_sharded_gat_on_host_mesh():
    from gnngls_tpu.core.graph import build_topology
    from gnngls_tpu.ops.gat import gat_conv, init_gat_params
    from gnngls_tpu.ops.gat_sharded import gat_conv_sharded

    mesh = mh.make_host_mesh(model_axis_size=2)
    topo = build_topology(8)
    params = init_gat_params(jax.random.PRNGKey(0), 16, 2, 8)
    x = jax.random.uniform(jax.random.PRNGKey(1), (topo.n_edges, 16))
    y1 = gat_conv(params, topo, x, 2)
    y2 = gat_conv_sharded(params, topo, x, 2, mesh)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
