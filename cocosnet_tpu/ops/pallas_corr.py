"""Fused correlation->softmax->warp Pallas TPU kernel with custom VJP.

Replaces the reference's materialized 4096x4096 correlation matrix
(correspondence.py:291-318) with a streaming kernel: for each block of query
rows the logits block lives only in VMEM, is row-softmaxed there, and is
immediately contracted with the value matrix. HBM traffic drops from
O(B*N*M) for the logits (64 MB/sample in f32) to O(B*(N+M)*(C+D)).

Layout: values are carried transposed, v_t (B, D, M). The warped channel
count D is tiny (3 RGB channels, or ~150 one-hot classes); in (M, D) layout
Mosaic would pad D up to the 128-lane tile and waste VMEM 40x. In (D, M)
layout D sits on the sublane axis (8-padding only) and M on the lane axis.

Backward follows the flash-attention recipe: the forward additionally emits
the row log-sum-exp; the VJP recomputes logits blockwise using
dd_i = sum_d dO_id * O_id to form dS = P * (dP - dd), in two kernels:
  - dq:    grid over query blocks (k, v_t resident in VMEM)
  - dk/dv: grid over key blocks   (q, g_t resident in VMEM)

Shapes: q (B,N,C), k (B,M,C), v_t (B,D,M); N, M multiples of 128 (4096 or
16384 in practice); C a lane multiple (256, or 2304 for match_kernel=3).

The correlation matmul accumulates in f32 with >=HIGH precision (bf16x3
passes): logits are divided by temperature=0.01 (correspondence.py:304), so
single-pass bf16 error (~4e-3) would be amplified 100x before the exp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK_Q = 128
_BLOCK_Q_BWD = 128
_BLOCK_K_BWD = 128
# The backward kernels keep the full k (or q) matrix resident (double-buffered,
# 8 MB at 4096x256xf32) and sweep it in chunks so only chunk-sized logits
# temporaries are live (~4 x BLOCK x CHUNK x 4B).
_BWD_CHUNK = 1024

def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return not _is_tpu()


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with x ~= hi + lo (error ~2^-16 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, dims):
    """bf16x3 matmul: ~f32 accuracy at 3 single-pass-bf16 MXU costs.

    Mosaic only lowers DEFAULT and HIGHEST dot precisions; HIGHEST is 6
    passes, so the classic (ahi*bhi + ahi*blo + alo*bhi) decomposition is
    2x faster for the same ~2^-22 relative error — which the temperature
    division (x100, correspondence.py:304) comfortably tolerates."""
    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    ahi, alo = _split_bf16(a)
    bhi, blo = _split_bf16(b)
    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)


# ---------------------------------------------------------------- forward

def _fwd_kernel(tau_inv_ref, q_ref, k_ref, vt_ref, o_ref, l_ref):
    """One (batch, query-block) step: online softmax over key chunks.

    Streaming keeps live temporaries chunk-sized, so VMEM stays within
    budget even when the value dim D is an entire one-hot label stack."""
    tau_inv = tau_inv_ref[0]
    q = q_ref[0]             # (BQ, C)
    m_total = k_ref.shape[1]
    chunk = min(_BWD_CHUNK, m_total)
    bq = q.shape[0]
    d = vt_ref.shape[1]

    def body(j, carry):
        m_prev, l_prev, acc = carry
        sl = pl.ds(j * chunk, chunk)
        kc = k_ref[0, sl, :]                         # (chunk, C)
        vtc = vt_ref[0, :, sl]                       # (D, chunk)
        s = _dot(q, kc, ((1,), (1,))) * tau_inv      # (BQ, chunk)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale = jnp.exp(m_prev - m_new)
        l_new = l_prev * scale + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * scale + _dot(p, vtc, ((1,), (1,)))   # (BQ, D)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, m_total // chunk, body, (m0, l0, acc0))
    o_ref[0] = acc / l
    l_ref[0] = m + jnp.log(l)


def _fwd(q: Array, k: Array, vt: Array, tau: float):
    b, n, c = q.shape
    m = k.shape[1]
    d = vt.shape[1]
    bq = min(_BLOCK_Q, n)
    tau_inv = jnp.full((1,), 1.0 / tau, jnp.float32)
    o, lse = pl.pallas_call(
        _fwd_kernel,
        grid=(b, n // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, c), lambda ib, iq: (ib, iq, 0)),
            pl.BlockSpec((1, m, c), lambda ib, iq: (ib, 0, 0)),
            pl.BlockSpec((1, d, m), lambda ib, iq: (ib, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda ib, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq: (ib, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * (c + d),
            bytes_accessed=4 * b * (n * c + m * c + m * d + n * d),
            transcendentals=b * n * m,
        ),
    )(tau_inv, q, k, vt)
    return o, lse


# ---------------------------------------------------------------- backward

def _dq_kernel(tau_inv_ref, q_ref, k_ref, vt_ref, gt_ref, lse_ref, dd_ref,
               dq_ref):
    tau_inv = tau_inv_ref[0]
    q = q_ref[0]             # (BQ, C)
    gt = gt_ref[0]           # (D, BQ)
    lse = lse_ref[0]         # (BQ, 1)
    dd = dd_ref[0]           # (BQ, 1)
    m_total = k_ref.shape[1]
    chunk = min(_BWD_CHUNK, m_total)

    def body(j, dq_acc):
        sl = pl.ds(j * chunk, chunk)
        kc = k_ref[0, sl, :]                         # (chunk, C)
        vtc = vt_ref[0, :, sl]                       # (D, chunk)
        s = _dot(q, kc, ((1,), (1,))) * tau_inv      # (BQ, chunk)
        p = jnp.exp(s - lse)
        dp = _dot(gt, vtc, ((0,), (0,)))             # (BQ, chunk)
        ds = p * (dp - dd)
        return dq_acc + _dot(ds, kc, ((1,), (0,)))

    dq = jax.lax.fori_loop(0, m_total // chunk, body,
                           jnp.zeros(dq_ref.shape[1:], dq_ref.dtype))
    dq_ref[0] = dq * tau_inv


def _dkv_kernel(tau_inv_ref, q_ref, k_ref, vt_ref, gt_ref, lse_ref, dd_ref,
                dk_ref, dvt_ref):
    tau_inv = tau_inv_ref[0]
    kb = k_ref[0]            # (BK, C)
    vtb = vt_ref[0]          # (D, BK)
    n_total = q_ref.shape[1]
    chunk = min(_BWD_CHUNK, n_total)

    def body(j, acc):
        dk_acc, dvt_acc = acc
        sl = pl.ds(j * chunk, chunk)
        qc = q_ref[0, sl, :]                         # (chunk, C)
        gtc = gt_ref[0, :, sl]                       # (D, chunk)
        s = _dot(qc, kb, ((1,), (1,))) * tau_inv     # (chunk, BK)
        p = jnp.exp(s - lse_ref[0, sl, :])
        dvt_acc = dvt_acc + _dot(gtc, p, ((1,), (0,)))   # (D, BK)
        dp = _dot(gtc, vtb, ((0,), (0,)))            # (chunk, BK)
        ds = p * (dp - dd_ref[0, sl, :])
        dk_acc = dk_acc + _dot(ds, qc, ((0,), (0,)))     # (BK, C)
        return dk_acc, dvt_acc

    dk, dvt = jax.lax.fori_loop(
        0, n_total // chunk, body,
        (jnp.zeros(dk_ref.shape[1:], dk_ref.dtype),
         jnp.zeros(dvt_ref.shape[1:], dvt_ref.dtype)))
    dk_ref[0] = dk * tau_inv
    dvt_ref[0] = dvt


def _bwd_impl(q, k, vt, tau, lse, dd, gt):
    b, n, c = q.shape
    m = k.shape[1]
    d = vt.shape[1]
    tau_inv = jnp.full((1,), 1.0 / tau, jnp.float32)

    bq = min(_BLOCK_Q_BWD, n)
    dq = pl.pallas_call(
        _dq_kernel,
        grid=(b, n // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, c), lambda ib, iq: (ib, iq, 0)),
            pl.BlockSpec((1, m, c), lambda ib, iq: (ib, 0, 0)),
            pl.BlockSpec((1, d, m), lambda ib, iq: (ib, 0, 0)),
            pl.BlockSpec((1, d, bq), lambda ib, iq: (ib, 0, iq)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq: (ib, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda ib, iq: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * (2 * c + d),
            bytes_accessed=4 * b * (2 * n * c + m * c + m * d + n * d),
            transcendentals=b * n * m,
        ),
    )(tau_inv, q, k, vt, gt, lse, dd)

    bk = min(_BLOCK_K_BWD, m)
    dk, dvt = pl.pallas_call(
        _dkv_kernel,
        grid=(b, m // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, c), lambda ib, ik: (ib, 0, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, ik: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, ik: (ib, 0, ik)),
            pl.BlockSpec((1, d, n), lambda ib, ik: (ib, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda ib, ik: (ib, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda ib, ik: (ib, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, c), lambda ib, ik: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, ik: (ib, 0, ik)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b, d, m), jnp.float32),
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * (2 * c + 2 * d),
            bytes_accessed=4 * b * (n * c + 2 * m * c + 2 * m * d + n * d),
            transcendentals=b * n * m,
        ),
    )(tau_inv, q, k, vt, gt, lse, dd)
    return dq, dk, dvt


# ---------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attend_t(q: Array, k: Array, vt: Array, tau: float) -> Array:
    o, _ = _fwd(q, k, vt, tau)
    return o


def _attend_t_fwd(q, k, vt, tau):
    o, lse = _fwd(q, k, vt, tau)
    return o, (q, k, vt, lse, o)


def _attend_t_bwd(tau, res, g):
    q, k, vt, lse, o = res
    dd = jnp.sum(g * o, axis=-1, keepdims=True)      # (B, N, 1)
    gt = jnp.swapaxes(g, 1, 2)                       # (B, D, N)
    return _bwd_impl(q, k, vt, tau, lse, dd, gt)


_attend_t.defvjp(_attend_t_fwd, _attend_t_bwd)


def attend_pallas(q: Array, k: Array, v: Array, tau: float) -> Array:
    """softmax(q k^T / tau, axis=-1) @ v with q:(B,N,C) k:(B,M,C) v:(B,M,D)."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    vt = jnp.swapaxes(v.astype(jnp.float32), 1, 2)
    return _attend_t(q, k, vt, tau)


# kept as the public name used by ops.correlation.attend
attend_pallas_padded = attend_pallas
