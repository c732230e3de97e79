"""Tensor-parallel FFN vs the plain path (8-device virtual mesh)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gnngls_tpu.ops.linear import init_linear, linear
from gnngls_tpu.ops.tp import ffn_tp, shard_ffn_params


@pytest.mark.parametrize("ndev,batch", [(8, (5,)), (4, (2, 3))])
def test_ffn_tp_matches_plain(ndev, batch):
    mesh = Mesh(np.array(jax.devices("cpu")[:ndev]), ("model",))
    C, Hd = 16, 64
    f1 = init_linear(jax.random.PRNGKey(0), C, Hd)
    f2 = init_linear(jax.random.PRNGKey(1), Hd, C)
    x = jax.random.normal(jax.random.PRNGKey(2), batch + (C,))

    want = linear(f2, jax.nn.relu(linear(f1, x)))
    f1s, f2s = shard_ffn_params(f1, f2, mesh)
    got = jax.jit(lambda a: ffn_tp(f1s, f2s, a, mesh))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ffn_tp_rejects_indivisible():
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("model",))
    f1 = init_linear(jax.random.PRNGKey(0), 8, 12)  # 12 % 8 != 0
    f2 = init_linear(jax.random.PRNGKey(1), 12, 8)
    with pytest.raises(ValueError):
        shard_ffn_params(f1, f2, mesh)
