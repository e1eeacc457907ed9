"""Spatial-parallel correlation (ops/corr_sp.py) vs the single-device
reference path, on the 8-virtual-device CPU mesh: sharding the query rows
over the `model` axis and exchanging unfold halos by ppermute must
reproduce attend_unfold exactly (same math, same f32 ops, different
placement)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cocosnet_tpu.ops.corr_shift import attend_unfold
from cocosnet_tpu.ops.corr_sp import attend_unfold_sp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _mesh(m):
    return Mesh(np.asarray(jax.devices()[:m]).reshape(1, m),
                ("data", "model"))


@pytest.mark.parametrize("m", [4, 8])
def test_sp_matches_single_device(m):
    b, h, w, c, d = 2, 16, 16, 8, 5
    rs = np.random.RandomState(0)
    f = rs.randn(b, h, w, c).astype(np.float32)
    g = rs.randn(b, h, w, c).astype(np.float32)
    v = rs.randn(b, h * w, d).astype(np.float32)
    tau = 0.01

    want = np.asarray(attend_unfold(jnp.asarray(f), jnp.asarray(g),
                                    jnp.asarray(v), tau, 3, True))

    mesh = _mesh(m)
    fn = shard_map(
        partial(attend_unfold_sp, tau=tau, axis_name="model"),
        mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model"), P(None, "model")),
        out_specs=P(None, "model"),
    )
    fs = jax.device_put(jnp.asarray(f), NamedSharding(mesh, P(None, "model")))
    gs = jax.device_put(jnp.asarray(g), NamedSharding(mesh, P(None, "model")))
    vs = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P(None, "model")))
    got = np.asarray(jax.jit(fn)(fs, gs, vs))

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_sp_composes_with_data_axis():
    """2-D parallelism: batch over `data` x query rows over `model`."""
    b, h, w, c, d = 4, 8, 16, 8, 3
    rs = np.random.RandomState(1)
    f = rs.randn(b, h, w, c).astype(np.float32)
    g = rs.randn(b, h, w, c).astype(np.float32)
    v = rs.randn(b, h * w, d).astype(np.float32)
    tau = 0.05

    want = np.asarray(attend_unfold(jnp.asarray(f), jnp.asarray(g),
                                    jnp.asarray(v), tau, 3, True))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "model"))
    fn = shard_map(
        partial(attend_unfold_sp, tau=tau, axis_name="model"),
        mesh=mesh,
        in_specs=(P("data", "model"), P("data", "model"),
                  P("data", "model")),
        out_specs=P("data", "model"),
    )
    sh4 = NamedSharding(mesh, P("data", "model"))
    sh3 = NamedSharding(mesh, P("data", "model"))
    got = np.asarray(jax.jit(fn)(
        jax.device_put(jnp.asarray(f), sh4),
        jax.device_put(jnp.asarray(g), sh4),
        jax.device_put(jnp.asarray(v), sh3)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_sp_spatial_centering_rejected():
    with pytest.raises(NotImplementedError):
        attend_unfold_sp(jnp.zeros((1, 4, 4, 8)), jnp.zeros((1, 4, 4, 8)),
                         jnp.zeros((1, 16, 2)), 0.01, "model", pono_c=False)
