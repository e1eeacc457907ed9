"""Fused 3x3 conv kernel (ops/pallas_conv) vs lax.conv oracle.

On CPU the kernel runs in Pallas interpret mode — slow but exact — so CI
covers the same code path that Mosaic compiles on TPU (shape handling, DMA
sequencing, tap construction, VJP routing)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cocosnet_tpu.ops.pallas_conv import (conv3x3_fused, conv3x3_supported,
                                          _pick_tiles)


def _oracle(x, k, b, reflect):
    if reflect:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@pytest.mark.parametrize("reflect", [False, True])
@pytest.mark.parametrize("shape", [
    (2, 8, 16, 64, 64),     # multi row-block
    (1, 4, 16, 151, 128),   # channel padding path (151 -> 256 lanes)
])
def test_conv3x3_matches_lax(shape, reflect):
    b_, h, w, ci, co = shape
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b_, h, w, ci).astype(np.float32))
    k = jnp.asarray((rs.randn(3, 3, ci, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    out = conv3x3_fused(x, k, b, reflect=reflect)
    ref = _oracle(x, k, b, reflect)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_leaky_epilogue():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 8, 16, 64).astype(np.float32))
    k = jnp.asarray((rs.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(64).astype(np.float32))
    out = conv3x3_fused(x, k, b, leaky=0.2)
    ref = _oracle(x, k, b, False)
    ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("reflect", [False, True])
def test_conv3x3_grads_match_lax(reflect):
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 16, 64).astype(np.float32))
    k = jnp.asarray((rs.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(64).astype(np.float32))

    def loss_p(x, k, b):
        return jnp.sum(jnp.sin(conv3x3_fused(x, k, b, reflect=reflect,
                                             leaky=0.2)))

    def loss_r(x, k, b):
        y = _oracle(x, k, b, reflect)
        return jnp.sum(jnp.sin(jnp.where(y >= 0, y, 0.2 * y)))

    gp = jax.grad(loss_p, (0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, (0, 1, 2))(x, k, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=2e-3)


def test_supported_gate():
    k3 = (3, 3, 128, 128)
    # stride / dilation / kernel-size gates are shape-independent
    assert not conv3x3_supported((2, 64, 64, 128), k3, stride=2,
                                 dilation=1, padding=1)
    assert not conv3x3_supported((2, 64, 64, 128), k3, stride=1,
                                 dilation=2, padding=1)
    assert not conv3x3_supported((2, 64, 64, 128), (4, 4, 128, 128),
                                 stride=1, dilation=1, padding=1)
    # reflect callers pass the raw input with padding=1 semantics
    assert not conv3x3_supported((2, 64, 64, 128), k3, stride=1,
                                 dilation=1, padding=0)
    # tiny channels / widths fall back
    assert not conv3x3_supported((2, 64, 64, 32), (3, 3, 32, 128),
                                 stride=1, dilation=1, padding=1)
    assert not conv3x3_supported((2, 64, 24, 128), (3, 3, 128, 128),
                                 stride=1, dilation=1, padding=1)


def test_pick_tiles_fits_vmem():
    """Every flagship conv shape must yield tiles within the 12MB budget
    (the gmid 1024->1024 layer OOM'd a 16MB scoped limit without cout
    tiling)."""
    for ho, wo, c, co in [(256, 256, 256, 128), (64, 64, 512, 512),
                          (16, 16, 1024, 1024), (64, 64, 512, 512)]:
        r, cot = _pick_tiles(ho, wo, c, co, 2)
        assert ho % r == 0 and co % cot == 0
        slabs = 2 * (r + 2) * wo * c * 2
        x3 = 2 * r * wo * 3 * c * 2
        acc = r * wo * cot * 4
        k3 = 2 * 9 * c * cot * 2
        outb = 2 * r * wo * cot * 2
        assert slabs + x3 + acc + k3 + outb <= 12 * 1024 * 1024


def test_training_trace_gate(monkeypatch):
    """Training steps trace with the fused conv off by default (fwd+bwd
    A/B loses to XLA's fused backward); COCOSNET_FUSED_CONV_TRAIN=1
    re-enables. Inference tracing is unaffected."""
    from cocosnet_tpu.ops import pallas_conv as pc
    monkeypatch.setattr(pc, "_is_tpu", lambda: True)
    args = ((2, 64, 64, 128), (3, 3, 128, 128))
    kw = dict(stride=1, dilation=1, padding=1)
    assert pc.conv3x3_supported(*args, **kw)
    with pc.training_trace():
        assert not pc.conv3x3_supported(*args, **kw)
        monkeypatch.setenv("COCOSNET_FUSED_CONV_TRAIN", "1")
        assert pc.conv3x3_supported(*args, **kw)
    monkeypatch.delenv("COCOSNET_FUSED_CONV_TRAIN")
    assert pc.conv3x3_supported(*args, **kw)


@pytest.mark.parametrize("shape", [
    (2, 12, 16, 64, 128),    # multi row-block, Cin != Cout
    (1, 8, 32, 96, 64),      # wider rows, odd-ish channels
])
def test_reflect_dx_ring_decomposition(shape):
    """The reflect backward computes dx as fused-interior + 1-D boundary
    ring scatter (ops/pallas_conv._bwd); pin it against lax.conv autodiff
    through an explicit reflect pad, which exercises every corner cell."""
    b_, h, w, ci, co = shape
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(b_, h, w, ci).astype(np.float32))
    k = jnp.asarray((rs.randn(3, 3, ci, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    co_t = jnp.asarray(rs.randn(b_, h, w, co).astype(np.float32))

    def loss_p(x_):
        return jnp.vdot(conv3x3_fused(x_, k, b, reflect=True), co_t)

    def loss_r(x_):
        return jnp.vdot(_oracle(x_, k, b, True), co_t)

    gp = jax.grad(loss_p)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("reflect", [False, True])
@pytest.mark.parametrize("shape", [
    (2, 8, 16, 64, 64),     # multi row-block
    (1, 4, 16, 151, 135),   # channel padding on both sides (407-class shape)
])
def test_conv3x3_fused_stats(shape, reflect):
    """conv3x3_fused_stats == (conv, instance-norm moments of its output):
    the (sum, sumsq) reduce from the f32 accumulator per row block and are
    summed across blocks — pin both the output and the moments."""
    from cocosnet_tpu.ops.pallas_conv import conv3x3_fused_stats

    b_, h, w, ci, co = shape
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(b_, h, w, ci).astype(np.float32))
    k = jnp.asarray((rs.randn(3, 3, ci, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    out, mean, var = conv3x3_fused_stats(x, k, b, reflect=reflect)
    ref = _oracle(x, k, b, reflect)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    ref32 = np.asarray(ref, np.float64)
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0],
                               ref32.mean(axis=(1, 2)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var)[:, 0, 0],
                               ref32.var(axis=(1, 2)), atol=1e-5, rtol=1e-4)


def test_residual_block_stats_path_matches_plain():
    """ResidualBlock routed through want_stats conv + instance_norm_apply
    must equal the composed conv -> instance_norm -> PReLU oracle."""
    from cocosnet_tpu.nn.blocks import ResidualBlock
    from cocosnet_tpu.nn.layers import Conv2d, PReLU
    from cocosnet_tpu.nn.norms import instance_norm
    import flax.linen as fnn

    class PlainBlock(fnn.Module):
        channels: int

        @fnn.compact
        def __call__(self, x):
            prelu = PReLU(name="prelu")
            out = Conv2d(self.channels, 3, padding=0, reflect_pad=True,
                         name="conv1")(x)
            out = prelu(instance_norm(out))
            out = Conv2d(self.channels, 3, padding=0, reflect_pad=True,
                         name="conv2")(out)
            return prelu(instance_norm(out) + x)

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, 8, 8, 24).astype(np.float32))
    blk = ResidualBlock(24)
    variables = blk.init(jax.random.PRNGKey(0), x)
    got = blk.apply(variables, x)
    want = PlainBlock(24).apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_stats_gate_excludes_training(monkeypatch):
    from cocosnet_tpu.ops import pallas_conv as pc
    monkeypatch.setattr(pc, "_is_tpu", lambda: True)
    args = ((2, 64, 64, 407), (3, 3, 407, 407))
    kw = dict(stride=1, dilation=1, padding=1)
    # the heavy pad-ratio shape is ACCEPTED by the stats gate (the fused
    # statistics win back an HBM pass) but still rejected by the plain gate
    assert pc.conv3x3_stats_supported(*args, **kw)
    assert not pc.conv3x3_supported(*args, **kw)
    with pc.training_trace():
        assert not pc.conv3x3_stats_supported(*args, **kw)


# ---------------------------------------------------------------- dW kernel

@pytest.mark.parametrize("reflect", [False, True])
@pytest.mark.parametrize("shape", [
    (2, 8, 16, 64, 64),     # multi row-block accumulation (b x nh sweep)
    (1, 4, 16, 151, 200),   # channel padding both sides (151/200 -> 256)
])
def test_conv3x3_dw_matches_lax_grad(shape, reflect):
    from cocosnet_tpu.ops.pallas_conv import conv3x3_dw
    b_, h, w, ci, co = shape
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(b_, h, w, ci).astype(np.float32))
    k = jnp.asarray((rs.randn(3, 3, ci, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    g = jnp.asarray(rs.randn(b_, h, w, co).astype(np.float32))

    dw, db = conv3x3_dw(x, g, reflect=reflect)
    ref_dw, ref_db = jax.grad(
        lambda kk, bb: jnp.vdot(_oracle(x, kk, bb, reflect), g),
        argnums=(0, 1))(k, b)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(ref_db),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("reflect", [False, True])
def test_conv3x3_xla_pdw_full_vjp(reflect):
    """The training route (XLA fwd + XLA dx + Pallas dW) must match plain
    XLA AD on every gradient."""
    from cocosnet_tpu.ops.pallas_conv import conv3x3_xla_pdw
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 8, 16, 64).astype(np.float32))
    k = jnp.asarray((rs.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(64).astype(np.float32))

    def loss_pdw(x, k, b):
        y = conv3x3_xla_pdw(x, k, b, reflect)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(_oracle(x, k, b, reflect)))

    out = loss_pdw(x, k, b)
    ref = loss_ref(x, k, b)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    gx, gk, gb = jax.grad(loss_pdw, argnums=(0, 1, 2))(x, k, b)
    rx, rk, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------- one-hot conv

@pytest.mark.parametrize("nc,co", [
    (151, 64),      # ade20k semantic_nc -> adaptor ndf (both lanes padded)
    (128, 128),     # no padding on either side
])
def test_conv3x3_onehot_matches_dense(nc, co):
    from cocosnet_tpu.ops.pallas_conv import conv3x3_onehot
    rs = np.random.RandomState(7)
    labels = jnp.asarray(rs.randint(0, nc, (2, 8, 128)).astype(np.int32))
    k = jnp.asarray((rs.randn(3, 3, nc, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    dense = jax.nn.one_hot(labels, nc, dtype=jnp.float32)
    out = conv3x3_onehot(labels, k, b, dtype=jnp.float32)
    ref = _oracle(dense, k, b, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_onehot_stats_and_leaky():
    from cocosnet_tpu.ops.pallas_conv import conv3x3_onehot
    rs = np.random.RandomState(8)
    nc, co = 151, 64
    labels = jnp.asarray(rs.randint(0, nc, (1, 8, 128)).astype(np.int32))
    k = jnp.asarray((rs.randn(3, 3, nc, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    out, mean, var = conv3x3_onehot(labels, k, b, dtype=jnp.float32,
                                    leaky=0.2, want_stats=True)
    dense = jax.nn.one_hot(labels, nc, dtype=jnp.float32)
    ref = _oracle(dense, k, b, False)
    ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0],
                               np.asarray(jnp.mean(ref, axis=(1, 2))),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var)[:, 0, 0],
                               np.asarray(jnp.var(ref, axis=(1, 2))),
                               atol=1e-4, rtol=1e-4)


def test_onehot_duck_falls_back_to_dense_path():
    """conv2d(OneHotLabels) off-TPU (or any unsupported shape) must densify
    and match conv2d on the explicit one-hot bit-for-bit."""
    from cocosnet_tpu.nn.layers import OneHotLabels, conv2d
    rs = np.random.RandomState(9)
    nc, co = 19, 32
    labels = jnp.asarray(rs.randint(0, nc, (2, 6, 10)).astype(np.int32))
    k = jnp.asarray((rs.randn(3, 3, nc, co) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    duck = OneHotLabels(labels, nc, jnp.float32)
    got = conv2d(duck, k, b, padding=1)
    want = conv2d(duck.dense(), k, b, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
    assert duck.shape == (2, 6, 10, nc) and duck.ndim == 4
    assert duck.astype(jnp.bfloat16).dtype == jnp.bfloat16
