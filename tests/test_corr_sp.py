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


# --------------------------- fused (Pallas shift9) SP form ---------------


def _sp_shift9_fn(mesh, tau, in_data=False):
    # check_vma=False: pallas's interpret-mode lowering does not yet
    # propagate varying-manual-axes through its internal dynamic_slices
    # (jax recommends exactly this workaround in the error message); the
    # forward-only path traces fine with the vma-annotated out_shapes.
    from cocosnet_tpu.ops.corr_sp import attend_shift9_sp
    spec = (P("data", "model") if in_data else P(None, "model"))
    return shard_map(
        partial(attend_shift9_sp, tau=tau, axis_name="model"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)


@pytest.mark.parametrize("m", [4, 8])
def test_shift9_sp_matches_single_device(m):
    """Fused-kernel SP (interpret mode on CPU) vs the single-device XLA
    oracle: same decomposition, kernel placement must not change the math
    beyond the kernel's bf16x3 tolerance."""
    b, h, w, c, d = 2, 16, 16, 8, 5
    rs = np.random.RandomState(2)
    f = rs.randn(b, h, w, c).astype(np.float32)
    g = rs.randn(b, h, w, c).astype(np.float32)
    v = rs.randn(b, h * w, d).astype(np.float32)
    tau = 0.01

    want = np.asarray(attend_unfold(jnp.asarray(f), jnp.asarray(g),
                                    jnp.asarray(v), tau, 3, True))
    mesh = _mesh(m)
    sh = NamedSharding(mesh, P(None, "model"))
    got = np.asarray(jax.jit(_sp_shift9_fn(mesh, tau))(
        jax.device_put(jnp.asarray(f), sh),
        jax.device_put(jnp.asarray(g), sh),
        jax.device_put(jnp.asarray(v), sh)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_shift9_sp_matches_fused_single_device():
    """SP placement vs the same kernel run single-device: identical
    blocking/numerics, so the tolerance is collective-roundoff tight."""
    from cocosnet_tpu.ops.pallas_shift9 import attend_shift9
    b, h, w, c, d = 1, 16, 16, 8, 4
    rs = np.random.RandomState(3)
    f = rs.randn(b, h, w, c).astype(np.float32)
    g = rs.randn(b, h, w, c).astype(np.float32)
    v = rs.randn(b, h * w, d).astype(np.float32)
    tau = 0.05

    want = np.asarray(attend_shift9(jnp.asarray(f), jnp.asarray(g),
                                    jnp.asarray(v), tau, True))
    mesh = _mesh(4)
    sh = NamedSharding(mesh, P(None, "model"))
    got = np.asarray(jax.jit(_sp_shift9_fn(mesh, tau))(
        jax.device_put(jnp.asarray(f), sh),
        jax.device_put(jnp.asarray(g), sh),
        jax.device_put(jnp.asarray(v), sh)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_shift9_sp_gradients_match():
    """d/d(f,g,v) through the SP form (ppermute + all_gather + fused
    kernel custom-VJP) vs the single-device XLA attend_unfold autodiff:
    validates that AD's psum_scatter of the kernel's dG3/dVt partials and
    the reverse-ppermute of halo grads reassemble the exact gradient."""
    b, h, w, c, d = 1, 8, 16, 8, 3
    rs = np.random.RandomState(4)
    f = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    g = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h * w, d).astype(np.float32))
    tau = 0.05

    def loss_ref(f_, g_, v_):
        return jnp.sum(jnp.sin(attend_unfold(f_, g_, v_, tau, 3, True)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(f, g, v)

    mesh = _mesh(4)
    sh = NamedSharding(mesh, P(None, "model"))
    fn = _sp_shift9_fn(mesh, tau)

    def loss_sp(f_, g_, v_):
        return jnp.sum(jnp.sin(fn(f_, g_, v_)))

    got = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(
        jax.device_put(f, sh), jax.device_put(g, sh), jax.device_put(v, sh))
    for w_, g_ in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   atol=2e-3, rtol=2e-3)


def test_shift9_sp_composes_with_data_axis():
    b, h, w, c, d = 4, 8, 16, 8, 3
    rs = np.random.RandomState(5)
    f = rs.randn(b, h, w, c).astype(np.float32)
    g = rs.randn(b, h, w, c).astype(np.float32)
    v = rs.randn(b, h * w, d).astype(np.float32)
    tau = 0.05

    want = np.asarray(attend_unfold(jnp.asarray(f), jnp.asarray(g),
                                    jnp.asarray(v), tau, 3, True))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "model"))
    sh = NamedSharding(mesh, P("data", "model"))
    got = np.asarray(jax.jit(_sp_shift9_fn(mesh, tau, in_data=True))(
        jax.device_put(jnp.asarray(f), sh),
        jax.device_put(jnp.asarray(g), sh),
        jax.device_put(jnp.asarray(v), sh)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_shift9_sp_supported_gate():
    from cocosnet_tpu.ops.corr_sp import shift9_sp_supported
    assert shift9_sp_supported(16, 64, 256)     # 128px/8-way shard
    assert shift9_sp_supported(4, 64, 256)      # shard smaller than a block
    assert not shift9_sp_supported(16, 48, 256)   # width not lane-tileable
    assert not shift9_sp_supported(12, 64, 256)   # rows not block-tileable
    assert not shift9_sp_supported(16, 64, 100)   # 3C not 128-aligned
