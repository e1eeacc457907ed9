"""Dense-correspondence attention: out = softmax(q @ k^T / tau) @ v.

This is the hot object of CoCosNet (SURVEY §2.5): at 256px with down=4 the
logits matrix is 4096x4096 per sample (correspondence.py:291-318), and the
same matrix is reused row-softmaxed (warp, direct warp-mask, cycle second hop)
and column-softmaxed (cycle first hop, warp_cycle, two_cycle). Column softmax
of S is row softmax of S^T, i.e. attend(k-side as queries), so one primitive
covers every path:

    row  pass: attend(theta, phi, V_row)
    col  pass: attend(phi, theta, V_col)

Two implementations:
- `attend_reference`: naive jnp, materializes the full logits matrix. Used as
  the correctness oracle and as the fallback on CPU.
- `attend_pallas` (ops/pallas_corr.py): fused streaming kernel that never
  writes the NxM matrix to HBM, with a flash-attention-style custom VJP.

The correlation matmul runs in f32 with HIGH precision (bf16x3 passes):
logits are divided by temperature=0.01 (correspondence.py:304), so
single-pass bf16 error (~4e-3) would be amplified 100x before the exp;
bf16x3 keeps the warped output within ~1e-4 of exact f32 while running
1.7x faster on the MXU (measured on v5e at C=2304).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_CORR_PRECISION = jax.lax.Precision.HIGH


def attend_reference(q: Array, k: Array, v: Array, tau: float) -> Array:
    """softmax(q k^T / tau, axis=-1) @ v.   q:(B,N,C) k:(B,M,C) v:(B,M,D)."""
    s = jnp.einsum("bnc,bmc->bnm", q, k,
                   preferred_element_type=jnp.float32,
                   precision=_CORR_PRECISION) / tau
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=_CORR_PRECISION)


def attend_chunked(q: Array, k: Array, v: Array, tau: float,
                   chunk: int = 512) -> Array:
    """Streaming attend at the XLA level: scan over query blocks with a
    rematerialized body, so at most (B, chunk, M) logits are ever live —
    forward AND backward. Used when the descriptor dim is too large for the
    VMEM-resident Pallas kernel (match_kernel=3 -> C=2304) and the full
    logits matrix would dominate HBM (B x 4096^2 x 4B = 64MB/sample,
    correspondence.py:291).

    AD through lax.map with a checkpointed body recomputes each block's
    softmax in the backward pass and accumulates dk/dv across blocks — the
    same recipe as the Pallas kernel's custom VJP, delegated to XLA.
    """
    b, n, c = q.shape
    d = v.shape[2]
    chunk = min(chunk, n)
    if n % chunk != 0:
        return attend_reference(q, k, v, tau)
    steps = n // chunk
    q_blocks = q.reshape(b, steps, chunk, c).swapaxes(0, 1)

    @jax.checkpoint
    def body(qb):
        s = jnp.einsum("bnc,bmc->bnm", qb, k,
                       preferred_element_type=jnp.float32,
                       precision=_CORR_PRECISION) / tau
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", p, v.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=_CORR_PRECISION)

    out = jax.lax.map(body, q_blocks)          # (steps, B, chunk, D)
    return out.swapaxes(0, 1).reshape(b, n, d)


def correlation_matrix(q: Array, k: Array, tau: float) -> Array:
    """Raw scaled logits (return_corr path, correspondence.py:305-306)."""
    s = jnp.einsum("bnc,bmc->bnm", q, k,
                   preferred_element_type=jnp.float32,
                   precision=_CORR_PRECISION)
    return s / tau


def wta_scale(f: Array, scale: float = 1e-4) -> Array:
    """Winner-take-all scaling with straight-through-ish gradient
    (correspondence.py:38-77): forward keeps the row max, multiplies the rest
    by `scale`; backward scales non-max grads by the same factor."""
    @jax.custom_vjp
    def _wta(x):
        m = jnp.max(x, axis=-1, keepdims=True)
        return jnp.where(x == m, x, x * scale)

    def _fwd(x):
        m = jnp.max(x, axis=-1, keepdims=True)
        mask = (x == m)
        return jnp.where(mask, x, x * scale), mask

    def _bwd(mask, g):
        return (jnp.where(mask, g, g * scale),)

    _wta.defvjp(_fwd, _bwd)
    return _wta(f)


def attend(q: Array, k: Array, v: Array, tau: float,
           use_pallas: bool = True) -> Array:
    """Dispatch: fused Pallas kernel when requested; otherwise the chunked
    XLA stream for large problems (bounds live logits to (B, 512, M)), or
    the plain dense form for small ones."""
    if use_pallas:
        from cocosnet_tpu.ops.pallas_corr import attend_pallas_padded
        return attend_pallas_padded(q, k, v, tau)
    b, n, _ = q.shape
    if b * n * k.shape[1] >= (1 << 26):  # >= 256 MB of f32 logits
        return attend_chunked(q, k, v, tau)
    return attend_reference(q, k, v, tau)
