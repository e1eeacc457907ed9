"""Fused correlation kernel vs naive jnp oracle (interpret mode on CPU) and
vs a torch softmax-warp oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from cocosnet_tpu.ops.correlation import attend_reference, wta_scale
from cocosnet_tpu.ops.pallas_corr import attend_pallas


def _inputs(B=2, N=256, M=256, C=128, D=6):
    rs = np.random.RandomState(0)
    q = rs.randn(B, N, C).astype(np.float32)
    k = rs.randn(B, M, C).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    v = rs.randn(B, M, D).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_attend_reference_matches_torch():
    q, k, v = _inputs()
    got = attend_reference(q, k, v, 0.01)
    qt, kt, vt = (torch.from_numpy(np.asarray(a)) for a in (q, k, v))
    f = torch.matmul(qt, kt.transpose(1, 2)) / 0.01
    want = torch.matmul(torch.softmax(f, dim=-1), vt)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_pallas_forward_matches_reference():
    q, k, v = _inputs()
    ref = attend_reference(q, k, v, 0.01)
    got = attend_pallas(q, k, v, 0.01)
    # kernel uses bf16x3 decomposition: ~2e-4 worst-case on softmax-warped
    # values (temperature 0.01 amplifies logits 100x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_pallas_grads_match_reference():
    q, k, v = _inputs(B=1, N=128, M=128, C=128, D=4)

    def lp(q, k, v):
        return jnp.sum(jnp.sin(attend_pallas(q, k, v, 0.01)))

    def lr(q, k, v):
        return jnp.sum(jnp.sin(attend_reference(q, k, v, 0.01)))

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-3


def test_column_softmax_via_transposed_attend():
    """col-softmax(S) @ u == attend(k, q, u): the cycle paths
    (correspondence.py:338,351) reuse the row kernel with q/k swapped."""
    q, k, v = _inputs(D=5)
    s = jnp.einsum("bnc,bmc->bnm", q, k) / 0.01
    pv = jax.nn.softmax(jnp.swapaxes(s, 1, 2), axis=-1)
    want = jnp.einsum("bmn,bnd->bmd", pv, v[:, : q.shape[1], :5])
    got = attend_reference(k, q, v[:, : q.shape[1], :5], 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_wta_scale():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8).astype(np.float32))
    y = wta_scale(x, 1e-4)
    m = jnp.max(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(jnp.max(y, -1, keepdims=True)), np.asarray(m))
    g = jax.grad(lambda x: jnp.sum(wta_scale(x, 1e-4) * 2.0))(x)
    mask = np.asarray(x == m)
    np.testing.assert_allclose(np.asarray(g), np.where(mask, 2.0, 2e-4), atol=1e-7)


def test_attend_chunked_matches_reference():
    from cocosnet_tpu.ops.correlation import attend_chunked
    q, k, v = _inputs(B=2, N=256, M=256, C=128, D=5)
    ref = attend_reference(q, k, v, 0.01)
    got = attend_chunked(q, k, v, 0.01, chunk=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def lc(q, k, v):
        from cocosnet_tpu.ops.correlation import attend_chunked
        return jnp.sum(jnp.sin(attend_chunked(q, k, v, 0.01, chunk=64)))

    def lr(q, k, v):
        return jnp.sum(jnp.sin(attend_reference(q, k, v, 0.01)))

    gc = jax.grad(lc, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gc, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4


def test_bigc_kernel_matches_reference():
    """Experimental large-descriptor flash kernel (ops/pallas_corr_bigc.py):
    correct fwd+bwd; production C=2304 path remains attend_chunked (see
    ROADMAP — on the current stack XLA's HIGH-precision exp/matmul wins)."""
    from cocosnet_tpu.ops.pallas_corr_bigc import attend_pallas_bigc
    q, k, v = _inputs(B=1, N=256, M=256, C=256, D=6)
    ref = attend_reference(q, k, v, 0.01)
    got = attend_pallas_bigc(q, k, v, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)

    def lp(q, k, v):
        return jnp.sum(jnp.sin(attend_pallas_bigc(q, k, v, 0.01)))

    def lr(q, k, v):
        return jnp.sum(jnp.sin(attend_reference(q, k, v, 0.01)))

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-3
