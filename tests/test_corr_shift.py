"""Parity tests for the shift-decomposed correlation (ops/corr_shift.py) and
the fused Pallas kernel (ops/pallas_shift9.py) against the materialized
unfold-descriptor oracle — the exact math of correspondence.py:272-318."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocosnet_tpu.ops import image as I
from cocosnet_tpu.ops.correlation import attend_reference
from cocosnet_tpu.ops.corr_shift import attend_unfold
from cocosnet_tpu.ops.pallas_shift9 import attend_shift9

_EPS = sys.float_info.epsilon


def oracle_descriptor(y, k, pono_c):
    """_descriptor semantics (models/correspondence.py:74-92) on unfolds."""
    b, h, w, c = y.shape
    desc = I.unfold_descriptors(y.astype(jnp.float32), k)
    if pono_c:
        desc = desc - jnp.mean(desc, axis=-1, keepdims=True)
    else:
        desc = desc - jnp.mean(desc, axis=1, keepdims=True)
    n = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-24)
    return desc / (n + _EPS)


def _inputs(h, w, c, d, seed=0):
    rs = np.random.RandomState(seed)
    f = jnp.asarray(rs.randn(2, h, w, c).astype(np.float32))
    g = jnp.asarray(rs.randn(2, h, w, c).astype(np.float32)) * 1.5 + 0.2
    v = jnp.asarray(rs.randn(2, h * w, d).astype(np.float32))
    return f, g, v


@pytest.mark.parametrize("pono_c", [True, False])
@pytest.mark.parametrize("shape", [(8, 8, 16, 3), (12, 8, 8, 5)])
def test_attend_unfold_matches_descriptor_oracle(pono_c, shape):
    h, w, c, d = shape
    f, g, v = _inputs(h, w, c, d)
    q = oracle_descriptor(f, 3, pono_c)
    k = oracle_descriptor(g, 3, pono_c)
    ref = attend_reference(q, k, v, 0.01)
    got = attend_unfold(f, g, v, 0.01, 3, pono_c, row_chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("pono_c", [True, False])
def test_attend_unfold_match_kernel5(pono_c):
    """The decomposition generalizes to any odd match_kernel."""
    h, w, c, d = 8, 8, 8, 3
    f, g, v = _inputs(h, w, c, d, seed=3)
    q = oracle_descriptor(f, 5, pono_c)
    k = oracle_descriptor(g, 5, pono_c)
    ref = attend_reference(q, k, v, 0.01)
    got = attend_unfold(f, g, v, 0.01, 5, pono_c, row_chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("pono_c", [True, False])
@pytest.mark.parametrize("shape", [(8, 8, 16, 3), (32, 8, 16, 5),
                                   (16, 16, 8, 3)])
def test_shift9_forward_matches(pono_c, shape):
    h, w, c, d = shape
    f, g, v = _inputs(h, w, c, d, seed=1)
    ref = attend_unfold(f, g, v, 0.01, 3, pono_c, row_chunk=4)
    got = attend_shift9(f, g, v, 0.01, pono_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("pono_c", [True, False])
def test_shift9_gradients_match(pono_c):
    """Custom VJP vs autodiff of the XLA decomposition: df, dg, dv."""
    h, w, c, d = 16, 8, 16, 3
    f, g, v = _inputs(h, w, c, d, seed=2)

    def loss_ref(f_, g_, v_):
        return jnp.sum(jnp.sin(attend_unfold(f_, g_, v_, 0.01, 3, pono_c,
                                             row_chunk=4)))

    def loss_ker(f_, g_, v_):
        return jnp.sum(jnp.sin(attend_shift9(f_, g_, v_, 0.01, pono_c)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(f, g, v)
    gp = jax.grad(loss_ker, argnums=(0, 1, 2))(f, g, v)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=2e-3)


def test_correspondence_uses_decomposition():
    """Full CorrespondenceNet forward at match_kernel=3 equals the same net
    evaluated through materialized descriptors (old path == WTA path)."""
    from cocosnet_tpu.config import test_defaults
    from cocosnet_tpu.models.correspondence import CorrespondenceNet

    opt = test_defaults(crop_size=32, load_size=32, label_nc=12,
                        ngf=16, maskmix=True, PONO=True,
                        PONO_C=True, use_attention=True, match_kernel=3,
                        warp_mask_losstype="direct", isTrain=False,
                        batchSize=2)
    net = CorrespondenceNet(opt)
    rs = np.random.RandomState(0)
    ref_img = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    sem = jax.nn.one_hot(
        jnp.asarray(rs.randint(0, 12, (2, 32, 32))), 12, dtype=jnp.float32)
    ref_sem = jax.nn.one_hot(
        jnp.asarray(rs.randint(0, 12, (2, 32, 32))), 12, dtype=jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                         ref_img, None, sem, ref_sem, train=False)
    out_new = net.apply(variables, ref_img, None, sem, ref_sem, train=False)
    # WTA_scale_weight != 1 forces the explicit-descriptor matrix path with
    # WTA scaling ~ identity at weight 1-epsilon... instead compare against
    # the WTA path with weight exactly 1 routed through the matrix: use
    # return_corr to fetch logits and warp manually.
    corr = net.apply(variables, ref_img, None, sem, ref_sem, train=False,
                     return_corr=True)["corr"]
    p = jax.nn.softmax(corr, axis=-1)
    ref_small = jax.image.resize(ref_img, (2, 8, 8, 3), "linear")
    # avg_pool matches the production path
    from cocosnet_tpu.ops.image import avg_pool
    ref_v = avg_pool(ref_img, 4).reshape(2, 64, 3)
    warp_manual = jnp.einsum("bnm,bmd->bnd", p, ref_v).reshape(2, 8, 8, 3)
    warp_new = out_new["warp_out"]
    # production path upsamples nearest x4; compare at low res
    warp_new_small = warp_new[:, ::4, ::4, :]
    np.testing.assert_allclose(np.asarray(warp_new_small),
                               np.asarray(warp_manual), atol=5e-4, rtol=1e-3)
