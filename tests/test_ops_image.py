"""Image-op parity vs torch CPU oracles (the reference's primitives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cocosnet_tpu.ops import image as I


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def to_torch_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def from_torch_nchw(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("out", [(8, 8), (64, 64), (300, 200)])
def test_resize_nearest_matches_torch(out):
    x = rand(2, 17, 23, 3)
    want = F.interpolate(to_torch_nchw(x), size=out, mode="nearest")
    got = I.resize_nearest(jnp.asarray(x), *out)
    np.testing.assert_allclose(np.asarray(got), from_torch_nchw(want), atol=0)


@pytest.mark.parametrize("scale", [2, 4])
def test_upsample_nearest(scale):
    x = rand(2, 5, 7, 4)
    want = F.interpolate(to_torch_nchw(x), scale_factor=scale, mode="nearest")
    got = I.upsample_nearest(jnp.asarray(x), scale)
    np.testing.assert_allclose(np.asarray(got), from_torch_nchw(want), atol=0)


@pytest.mark.parametrize("scale", [2, 4])
def test_upsample_bilinear(scale):
    x = rand(1, 16, 16, 3)
    want = F.interpolate(to_torch_nchw(x), scale_factor=scale, mode="bilinear",
                         align_corners=False)
    got = I.upsample_bilinear(jnp.asarray(x), scale)
    np.testing.assert_allclose(np.asarray(got), from_torch_nchw(want),
                               atol=2e-6)


def test_avg_pool():
    x = rand(2, 16, 16, 5)
    want = F.avg_pool2d(to_torch_nchw(x), 4)
    got = I.avg_pool(jnp.asarray(x), 4)
    np.testing.assert_allclose(np.asarray(got), from_torch_nchw(want), atol=1e-6)


def test_max_pool():
    x = rand(2, 16, 16, 5)
    want = F.max_pool2d(to_torch_nchw(x), 2)
    got = I.max_pool(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), from_torch_nchw(want), atol=0)


def test_avg_pool_3x3_s2_p1():
    x = rand(2, 15, 17, 3)
    want = F.avg_pool2d(to_torch_nchw(x), kernel_size=3, stride=2,
                        padding=[1, 1], count_include_pad=False)
    got = I.avg_pool_3x3_s2_p1(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_torch_nchw(want), atol=1e-6)


def test_space_to_patches_roundtrip_and_torch():
    x = rand(2, 16, 16, 3)
    d = 4
    want = F.unfold(to_torch_nchw(x), d, stride=d)  # (N, C*d*d, L)
    got = I.space_to_patches(jnp.asarray(x), d)     # (N, L, C*d*d)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               want.numpy(), atol=0)
    back = I.patches_to_space(got, d, 16, 16)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


@pytest.mark.parametrize("k", [1, 3])
def test_unfold_descriptors(k):
    x = rand(2, 8, 8, 6)
    want = F.unfold(to_torch_nchw(x), kernel_size=k, padding=k // 2)  # (N,C*k*k,HW)
    got = I.unfold_descriptors(jnp.asarray(x), k)  # (N, HW, C*k*k)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               want.numpy(), atol=0)


def test_one_hot_scatter():
    lab = np.random.RandomState(0).randint(0, 5, size=(2, 4, 4))
    got = I.one_hot_scatter(jnp.asarray(lab), 5)
    t = torch.zeros(2, 5, 4, 4).scatter_(1, torch.from_numpy(lab)[:, None], 1.0)
    np.testing.assert_allclose(np.asarray(got), from_torch_nchw(t), atol=0)
