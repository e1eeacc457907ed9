"""Mesh/sharding semantics: synchronized batch statistics fall out of pjit.

The reference needs the Synchronized-BatchNorm-PyTorch package with
DataParallel callbacks (SURVEY §2.10); here a batch-stat reduction over a
sharded batch IS the global reduction. These tests pin that claim.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cocosnet_tpu import mesh as M
from cocosnet_tpu.nn.norms import BatchNorm

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_batchnorm_stats_identical_sharded_vs_single():
    mesh = M.create_mesh(data=8)
    rs = np.random.RandomState(0)
    x = rs.randn(16, 8, 8, 4).astype(np.float32)

    bn = BatchNorm(4)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    @jax.jit
    def run(v, x):
        return bn.apply(v, x, train=True, mutable=["batch_stats"])

    # single device
    y1, upd1 = run(variables, jnp.asarray(x))

    # batch sharded over 8 devices
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    vr = jax.device_put(variables, NamedSharding(mesh, P()))
    y2, upd2 = run(vr, xs)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd1["batch_stats"]["mean"]),
                               np.asarray(upd2["batch_stats"]["mean"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd1["batch_stats"]["var"]),
                               np.asarray(upd2["batch_stats"]["var"]),
                               atol=1e-6)


def test_gradients_identical_sharded_vs_single():
    """Data-parallel grads == single-device grads on the same global batch
    (the psum the reference gets from DataParallel gather)."""
    mesh = M.create_mesh(data=8)
    rs = np.random.RandomState(1)
    x = rs.randn(16, 32).astype(np.float32)
    w = rs.randn(32, 8).astype(np.float32)

    def loss(w, x):
        return jnp.mean(jax.nn.relu(x @ w) ** 2)

    g1 = jax.jit(jax.grad(loss))(jnp.asarray(w), jnp.asarray(x))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    wr = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P()))
    g2 = jax.jit(jax.grad(loss))(wr, xs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
