"""Fused correlation kernel for large descriptors (match_kernel=3 -> C=2304).

The VMEM-resident kernel in pallas_corr.py holds the full key matrix on
chip, which caps C near 1024. Here BOTH the query and key dimensions are
blocked on the grid — grid (B, NQ, NK), NK innermost — with the online
softmax state (running max / sum / weighted accumulator) carried across the
NK sweep in VMEM scratch, written out on the last key block. HBM traffic is
O((N+M)*C) per query block instead of O(N*M) logits.

Numerics: inputs arrive pre-split as bf16 (hi, lo) pairs so every logits
matmul runs the 3-pass bf16 decomposition at full MXU rate (Mosaic has no
HIGH dot precision); the temperature division (tau=0.01,
correspondence.py:304) rules out single-pass bf16.

Backward (flash recipe, dd = rowsum(dO*O) and the forward's row logsumexp):
  - dq:    grid (B, NQ, NK), dq accumulated in scratch over the key sweep
  - dk/dv: grid (B, NK, NQ), dk/dv accumulated over the query sweep
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BQ = 256
_BK = 256
# backward blocks are smaller: each kernel carries a (block, C) f32
# accumulator in scratch next to double-buffered hi/lo operand blocks
_BQ_BWD = 128
_BK_BWD = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _split_bf16(x: Array):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_split(ahi, alo, bhi, blo, dims):
    """bf16x4 product of pre-split operands, f32 accumulation.

    The lo*lo term costs one extra bf16 pass (4 total vs HIGHEST's 6) and
    brings the error to ~2^-24 relative — the tau=0.01 division amplifies
    logit error 100x, and the 3-term form's ~2^-16 was visible (1e-2) in the
    warped output."""
    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)
    return d(ahi, bhi) + (d(ahi, blo) + d(alo, bhi) + d(alo, blo))


def _dot3(a, b, dims):
    """bf16x4 product of f32 operands (splits inline; for small matmuls)."""
    ahi, alo = _split_bf16(a)
    bhi, blo = _split_bf16(b)
    return _dot_split(ahi, alo, bhi, blo, dims)


# ---------------------------------------------------------------- forward

def _fwd_kernel(tau_inv_ref, qhi_ref, qlo_ref, khi_ref, klo_ref, vt_ref,
                o_ref, lse_ref, m_s, l_s, acc_s):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    s = _dot_split(qhi_ref[0], qlo_ref[0], khi_ref[0], klo_ref[0],
                   ((1,), (1,))) * tau_inv_ref[0]           # (BQ, BK)
    m_prev = m_s[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    scale = jnp.exp(m_prev - m_new)
    l_s[:] = l_s[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    acc_s[:] = acc_s[:] * scale + _dot3(p, vt_ref[0], ((1,), (1,)))  # (BQ,D)
    m_s[:] = m_new

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0] = acc_s[:] / l_s[:]
        lse_ref[0] = m_s[:] + jnp.log(l_s[:])


def _fwd(qhi, qlo, khi, klo, vt, tau):
    b, n, c = qhi.shape
    m = khi.shape[1]
    d = vt.shape[1]
    bq, bk = min(_BQ, n), min(_BK, m)
    tau_inv = jnp.full((1,), 1.0 / tau, jnp.float32)
    o, lse = pl.pallas_call(
        _fwd_kernel,
        grid=(b, n // bq, m // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, iq, ik: (ib, 0, ik)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * (3 * c + d),
            bytes_accessed=4 * b * (n * c + (n // bq) * m * c + m * d + n * d),
            transcendentals=b * n * m,
        ),
    )(tau_inv, qhi, qlo, khi, klo, vt)
    return o, lse


# ---------------------------------------------------------------- backward

def _dq_kernel(tau_inv_ref, qhi_ref, qlo_ref, khi_ref, klo_ref, vt_ref,
               gt_ref, lse_ref, dd_ref, dq_ref, dq_s):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        dq_s[:] = jnp.zeros_like(dq_s)

    tau_inv = tau_inv_ref[0]
    s = _dot_split(qhi_ref[0], qlo_ref[0], khi_ref[0], klo_ref[0],
                   ((1,), (1,))) * tau_inv                   # (BQ, BK)
    p = jnp.exp(s - lse_ref[0])
    # dp = g @ v^T with both carried transposed: contract the D axis
    dp = _dot3(gt_ref[0], vt_ref[0], ((0,), (0,)))           # (BQ, BK)
    ds = p * (dp - dd_ref[0])
    khi = khi_ref[0].astype(jnp.float32)
    klo = klo_ref[0].astype(jnp.float32)
    contrib = _dot3(ds, khi + klo, ((1,), (0,)))
    dq_s[:] = dq_s[:] + contrib * tau_inv

    @pl.when(ik == nk - 1)
    def _():
        dq_ref[0] = dq_s[:]


def _dkv_kernel(tau_inv_ref, qhi_ref, qlo_ref, khi_ref, klo_ref, vt_ref,
                gt_ref, lse_ref, dd_ref, dk_ref, dvt_ref, dk_s, dvt_s):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _():
        dk_s[:] = jnp.zeros_like(dk_s)
        dvt_s[:] = jnp.zeros_like(dvt_s)

    tau_inv = tau_inv_ref[0]
    s = _dot_split(qhi_ref[0], qlo_ref[0], khi_ref[0], klo_ref[0],
                   ((1,), (1,))) * tau_inv                   # (BQ, BK)
    p = jnp.exp(s - lse_ref[0])
    gt = gt_ref[0]                                           # (D, BQ)
    dvt_s[:] = dvt_s[:] + _dot3(gt, p, ((1,), (0,)))         # (D, BK)
    dp = _dot3(gt, vt_ref[0], ((0,), (0,)))                  # (BQ, BK)
    ds = p * (dp - dd_ref[0])
    qhi = qhi_ref[0].astype(jnp.float32)
    qlo = qlo_ref[0].astype(jnp.float32)
    dk_s[:] = dk_s[:] + _dot3(ds, qhi + qlo, ((0,), (0,))) * tau_inv

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_s[:]
        dvt_ref[0] = dvt_s[:]


def _bwd_impl(qhi, qlo, khi, klo, vt, tau, lse, dd, gt):
    b, n, c = qhi.shape
    m = khi.shape[1]
    d = vt.shape[1]
    bq, bk = min(_BQ_BWD, n), min(_BK_BWD, m)
    tau_inv = jnp.full((1,), 1.0 / tau, jnp.float32)

    dq = pl.pallas_call(
        _dq_kernel,
        grid=(b, n // bq, m // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, iq, ik: (ib, 0, ik)),
            pl.BlockSpec((1, d, bq), lambda ib, iq, ik: (ib, 0, iq)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, c), jnp.float32)],
        interpret=_interpret(),
    )(tau_inv, qhi, qlo, khi, klo, vt, gt, lse, dd)

    dk, dvt = pl.pallas_call(
        _dkv_kernel,
        grid=(b, m // bk, n // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, c), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bq, c), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, ik, iq: (ib, 0, ik)),
            pl.BlockSpec((1, d, bq), lambda ib, ik, iq: (ib, 0, iq)),
            pl.BlockSpec((1, bq, 1), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, ik, iq: (ib, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, ik, iq: (ib, 0, ik)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b, d, m), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, c), jnp.float32),
            pltpu.VMEM((d, bk), jnp.float32),
        ],
        interpret=_interpret(),
    )(tau_inv, qhi, qlo, khi, klo, vt, gt, lse, dd)
    return dq, dk, dvt


# ---------------------------------------------------------------- public

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attend_bigc_t(q: Array, k: Array, vt: Array, tau: float) -> Array:
    qhi, qlo = _split_bf16(q)
    khi, klo = _split_bf16(k)
    o, _ = _fwd(qhi, qlo, khi, klo, vt, tau)
    return o


def _attend_bigc_fwd(q, k, vt, tau):
    qhi, qlo = _split_bf16(q)
    khi, klo = _split_bf16(k)
    o, lse = _fwd(qhi, qlo, khi, klo, vt, tau)
    return o, (qhi, qlo, khi, klo, vt, lse, o)


def _attend_bigc_bwd(tau, res, g):
    qhi, qlo, khi, klo, vt, lse, o = res
    dd = jnp.sum(g * o, axis=-1, keepdims=True)
    gt = jnp.swapaxes(g, 1, 2)
    return _bwd_impl(qhi, qlo, khi, klo, vt, tau, lse, dd, gt)


_attend_bigc_t.defvjp(_attend_bigc_fwd, _attend_bigc_bwd)


def attend_pallas_bigc(q: Array, k: Array, v: Array, tau: float) -> Array:
    """softmax(q k^T / tau) @ v for descriptor dims beyond VMEM residency."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    vt = jnp.swapaxes(v.astype(jnp.float32), 1, 2)
    return _attend_bigc_t(q, k, vt, tau)
