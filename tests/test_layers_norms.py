"""Layer/norm parity vs torch CPU oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cocosnet_tpu.nn import layers as L
from cocosnet_tpu.nn import norms as N


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("stride,pad,dil,k", [(1, 1, 1, 3), (2, 1, 1, 4),
                                              (1, 2, 2, 3), (1, 0, 1, 1)])
def test_conv2d_matches_torch(stride, pad, dil, k):
    x = rand(2, 16, 16, 5)
    w = rand(k, k, 5, 7, seed=1)  # HWIO
    b = rand(7, seed=2)
    got = L.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                   stride=stride, padding=pad, dilation=dil)
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    want = F.conv2d(nchw(x), wt, torch.from_numpy(b), stride=stride,
                    padding=pad, dilation=dil)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=2e-5)


def test_reflect_pad():
    x = rand(1, 6, 6, 2)
    got = L.reflect_pad_2d(jnp.asarray(x), 2)
    want = F.pad(nchw(x), (2, 2, 2, 2), mode="reflect")
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=0)


def test_spectral_norm_matches_torch():
    """One power iteration per train forward, same u/W coupling as
    torch.nn.utils.spectral_norm (architecture.py:48-51)."""
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(4, 6, 3, padding=1)
    snconv = torch.nn.utils.spectral_norm(conv)
    # note: .numpy() aliases torch's buffers, and torch updates weight_u
    # in-place during forward — copy so the jax side keeps its own state
    w = snconv.weight_orig.detach().numpy().copy()   # OIHW
    u0 = snconv.weight_u.detach().numpy().copy()
    x = rand(2, 8, 8, 4)

    m = L.Conv2d(6, 3, padding=1, weight_norm="spectral")
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # HWIO
    variables = {
        "params": {"kernel": kernel,
                   "bias": jnp.asarray(snconv.bias.detach().numpy())},
        "spectral": {"u": jnp.asarray(u0)},
    }
    for step in range(3):
        got, updates = m.apply(variables, jnp.asarray(x), mutable=["spectral"])
        variables = {**variables, "spectral": updates["spectral"]}
        want = snconv(nchw(x))
        np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=3e-5)
        np.testing.assert_allclose(np.asarray(variables["spectral"]["u"]),
                                   snconv.weight_u.detach().numpy().copy(),
                                   atol=1e-5)
    # eval mode: stored u, no state advance
    snconv.eval()
    got_eval = m.apply(variables, jnp.asarray(x))
    want_eval = snconv(nchw(x))
    np.testing.assert_allclose(np.asarray(got_eval), nhwc(want_eval), atol=3e-5)


def test_instance_norm():
    x = rand(2, 9, 9, 5)
    got = N.instance_norm(jnp.asarray(x))
    want = F.instance_norm(nchw(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)


def test_positional_norm():
    x = rand(2, 7, 7, 16)
    got = N.positional_norm(jnp.asarray(x))
    xt = nchw(x)
    mean = xt.mean(dim=1, keepdim=True)
    std = xt.var(dim=1, keepdim=True).add(1e-5).sqrt()
    want = (xt - mean) / std
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)


def test_batch_norm_train_and_eval():
    x = rand(4, 6, 6, 3)
    bn = torch.nn.BatchNorm2d(3)
    m = N.BatchNorm(3)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    for _ in range(3):
        got, upd = m.apply(variables, jnp.asarray(x), train=True,
                           mutable=["batch_stats"])
        variables = {**variables, "batch_stats": upd["batch_stats"]}
        want = bn(nchw(x))
        np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["var"]),
                               bn.running_var.numpy(), atol=1e-5)
    bn.eval()
    got = m.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), nhwc(bn(nchw(x))), atol=1e-5)


def test_prelu():
    x = rand(2, 4, 4, 3)
    m = L.PReLU()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply(v, jnp.asarray(x))
    want = F.prelu(nchw(x), torch.tensor([0.25]))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-6)
