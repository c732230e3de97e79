"""The test suite must compute on the 8-device virtual CPU platform (conftest.py)."""

import jax
import jax.numpy as jnp


def test_virtual_cpu_mesh():
    assert len(jax.devices("cpu")) == 8


def test_default_computation_on_cpu():
    x = jnp.arange(8.0)
    assert list(x.devices())[0].platform == "cpu"
