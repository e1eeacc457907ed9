"""Fused shift-decomposed correlation kernel for match_kernel=3 (TPU Pallas).

The flagship CoCosNet correlation uses 3x3-unfolded 2304-dim descriptors
(correspondence.py:276-291). ops/corr_shift.py derives the exact
decomposition; this kernel fuses it into one streaming pass with a layout
chosen so every block is grid-aligned (no halo DMA):

  - The row shifts (dy) are folded into the channel dim OUTSIDE the kernel:
    F3(h,w) = [f(h-1,w) | f(h,w) | f(h+1,w)]  -> 768-dim features.
    S3 = F3 @ G3^T captures all dy terms in one matmul at 1/3 the FLOPs of
    the full 2304-dim unfold product.
  - The column shifts (dx = +-1) become single-element diagonal rolls of S3
    inside VMEM with w-boundary masks:
        raw = S3 + Mq+ Mk+ roll(S3,-1,-1) + Mq- Mk- roll(S3,+1,+1)
    Because blocks are whole image rows (block = R*W positions), a +-1 roll
    only escapes the block at masked boundary columns (w=0 / w=W-1), so the
    wrapped values are exactly the zeros the unfold's padding demands.
  - Descriptor centering + L2 normalization (PONO_C or spatial) are rank-1
    corrections from per-position box statistics, precomputed outside and
    applied to the (R*W, R*W) logits tile in VMEM:
        logits = (raw - qmul kmul + qadd + kadd + cadd) * qs * ks
    (qs folds in 1/tau; unused terms are zero for each centering mode).
  - Row-softmax is the usual online (flash) accumulation over key blocks;
    values ride transposed (D on sublanes) as in ops/pallas_corr.py.

HBM traffic: O(N * 3C) per query block — the NxN logits never leave VMEM,
and the 2304-dim descriptor tensors (226 MB per side at batch 6) are never
materialized at all. The backward follows the flash recipe with the same
shift/mask structure transposed; block-aligned accumulators make dF3/dG3
plain outputs (no overlap-add).

Numerics: the S3 matmul runs as 3-pass bf16 (hi/lo split outside the
kernel); temperature tau=0.01 amplifies logit error 100x, which bf16x3's
~2^-16 relative error tolerates (same policy as ops/correlation.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

def _block_rows(w: int) -> int:
    """Image rows per block, targeting ~512-position (4-lane-tile) blocks."""
    return max(1, 512 // w)


def _block_rows_bwd(w: int) -> int:
    """Backward blocks are half-size: the dq/dk kernels carry (block, 3C)
    f32 accumulators next to four bf16 operand blocks, which busts the 16MB
    VMEM budget at 512-position blocks."""
    return max(1, 256 // w)


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return not _is_tpu()


def _split_bf16(x: Array):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _out_struct(shape, dtype, *operands):
    """ShapeDtypeStruct whose `vma` (varying-across-mesh-axes) is inherited
    from the operands, so the pallas_calls trace under shard_map(check_vma=
    True) — the kernel output varies over exactly the axes its inputs do
    (used by ops/corr_sp.attend_shift9_sp)."""
    vma = set()
    for x in operands:
        vma |= set(getattr(jax.typeof(x), "vma", ()) or ())
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def _dot_split(ahi, alo, bhi, blo, dims):
    """bf16x3 product of pre-split operands, f32 accumulation."""
    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)
    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)


def _dot3(a, b, dims):
    ahi, alo = _split_bf16(a)
    bhi, blo = _split_bf16(b)
    return _dot_split(ahi, alo, bhi, blo, dims)


def _col_masks(rows: int, cols: int, w: int):
    """(rows,1) and (1,cols) 0/1 masks for the dx=+1 and dx=-1 shifts:
    +1 invalidates w == W-1, -1 invalidates w == 0 (unfold zero padding)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % w
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1) % w
    qp = (ri != (w - 1)).astype(jnp.float32)   # query mask for dx=+1
    qm = (ri != 0).astype(jnp.float32)         # query mask for dx=-1
    kp = (ci != (w - 1)).astype(jnp.float32)
    km = (ci != 0).astype(jnp.float32)
    return qp, qm, kp, km


def _shift_sum(s3: Array, w: int) -> Array:
    """raw(i,j) = sum_dx mask_dx * S3(i+dx, j+dx) via diagonal rolls."""
    rows, cols = s3.shape
    qp, qm, kp, km = _col_masks(rows, cols, w)
    plus = jnp.roll(jnp.roll(s3, -1, axis=0), -1, axis=1)   # S3(i+1, j+1)
    minus = jnp.roll(jnp.roll(s3, 1, axis=0), 1, axis=1)    # S3(i-1, j-1)
    return s3 + qp * kp * plus + qm * km * minus


def _unshift_sum(da: Array, w: int) -> Array:
    """Adjoint of _shift_sum: dS3 = dA + roll(mask*dA, +1,+1)
    + roll(mask*dA, -1,-1)."""
    rows, cols = da.shape
    qp, qm, kp, km = _col_masks(rows, cols, w)
    back_p = jnp.roll(jnp.roll(qp * kp * da, 1, axis=0), 1, axis=1)
    back_m = jnp.roll(jnp.roll(qm * km * da, -1, axis=0), -1, axis=1)
    return da + back_p + back_m


def _logits(raw, qv, kv):
    """(raw - qmul kmul + qadd + kadd + cadd) * qs * ks.
    qv: (BQ, 4) columns [qs, qmul, qadd, cadd]; kv: (4, BK) rows
    [ks, kmul, kadd, 0]."""
    qs, qmul, qadd, cadd = (qv[:, 0:1], qv[:, 1:2], qv[:, 2:3], qv[:, 3:4])
    ks, kmul, kadd = kv[0:1, :], kv[1:2, :], kv[2:3, :]
    return (raw - qmul * kmul + qadd + kadd + cadd) * qs * ks


# ------------------------------------------------------------------ forward

def _fwd_kernel(w, fqh_ref, fql_ref, gkh_ref, gkl_ref, vt_ref,
                qv_ref, kv_ref, o_ref, lse_ref, m_s, l_s, acc_s):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    s3 = _dot_split(fqh_ref[0], fql_ref[0], gkh_ref[0], gkl_ref[0],
                    ((1,), (1,)))                      # (BQ, BK)
    raw = _shift_sum(s3, w)
    logits = _logits(raw, qv_ref[0], kv_ref[0])

    m_prev = m_s[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    scale = jnp.exp(m_prev - m_new)
    l_s[:] = l_s[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    acc_s[:] = acc_s[:] * scale + _dot3(p, vt_ref[0], ((1,), (1,)))
    m_s[:] = m_new

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0] = acc_s[:] / l_s[:]
        lse_ref[0] = m_s[:] + jnp.log(l_s[:])


def _fwd(f3h, f3l, g3h, g3l, vt, qv, kv, w):
    """nq (query rows, from f3) and nk (key rows, from g3) may differ:
    the spatial-parallel form (ops/corr_sp.attend_shift9_sp) runs each
    device's query shard against the all-gathered keys."""
    b, nq, c3 = f3h.shape
    nk = g3h.shape[1]
    d = vt.shape[1]
    r = _block_rows(w)
    bq = min(r * w, nq)
    bk = min(r * w, nk)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, w),
        grid=(b, nq // bq, nk // bk),
        in_specs=[
            pl.BlockSpec((1, bq, c3), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, c3), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c3), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c3), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, iq, ik: (ib, 0, ik)),
            pl.BlockSpec((1, bq, 4), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, 4, bk), lambda ib, iq, ik: (ib, 0, ik)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0)),
        ),
        out_shape=(
            _out_struct((b, nq, d), jnp.float32, f3h, g3h, vt),
            _out_struct((b, nq, 1), jnp.float32, f3h, g3h, vt),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq * nk * (3 * c3 + d),
            bytes_accessed=4 * b * ((nq // bq) * nk * c3 + nq * c3
                                    + nk * d),
            transcendentals=b * nq * nk,
        ),
    )(f3h, f3l, g3h, g3l, vt, qv, kv)
    return o, lse


# ----------------------------------------------------------------- backward

def _dq_kernel(w, fqh_ref, fql_ref, gkh_ref, gkl_ref, vt_ref,
               qv_ref, kv_ref, gt_ref, lse_ref, dd_ref,
               df_ref, dqv_ref, df_s, dqv_s):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        df_s[:] = jnp.zeros_like(df_s)
        dqv_s[:] = jnp.zeros_like(dqv_s)

    s3 = _dot_split(fqh_ref[0], fql_ref[0], gkh_ref[0], gkl_ref[0],
                    ((1,), (1,)))
    raw = _shift_sum(s3, w)
    qv = qv_ref[0]
    kv = kv_ref[0]
    logits = _logits(raw, qv, kv)
    p = jnp.exp(logits - lse_ref[0])
    dp = _dot3(gt_ref[0], vt_ref[0], ((0,), (0,)))     # (BQ, BK)
    gl = p * (dp - dd_ref[0])
    qs = qv[:, 0:1]
    ks = kv[0:1, :]
    da = gl * qs * ks                                  # d(raw)
    # side grads (row reductions)
    dqs = jnp.sum(gl * logits, axis=-1, keepdims=True) / qs
    dqmul = -jnp.sum(da * kv[1:2, :], axis=-1, keepdims=True)
    dqadd = jnp.sum(da, axis=-1, keepdims=True)
    dqv_s[:] = dqv_s[:] + jnp.concatenate(
        [dqs, dqmul, dqadd, dqadd], axis=1)            # cadd grad == qadd's
    ds3 = _unshift_sum(da, w)
    gk = gkh_ref[0].astype(jnp.float32) + gkl_ref[0].astype(jnp.float32)
    df_s[:] = df_s[:] + _dot3(ds3, gk, ((1,), (0,)))

    @pl.when(ik == nk - 1)
    def _():
        df_ref[0] = df_s[:]
        dqv_ref[0] = dqv_s[:]


def _dk_kernel(w, fqh_ref, fql_ref, gkh_ref, gkl_ref, vt_ref,
               qv_ref, kv_ref, gt_ref, lse_ref, dd_ref,
               dg_ref, dkv_ref, dvt_ref, dg_s, dkv_s, dvt_s):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _():
        dg_s[:] = jnp.zeros_like(dg_s)
        dkv_s[:] = jnp.zeros_like(dkv_s)
        dvt_s[:] = jnp.zeros_like(dvt_s)

    s3 = _dot_split(fqh_ref[0], fql_ref[0], gkh_ref[0], gkl_ref[0],
                    ((1,), (1,)))                      # (BQ, BK)
    raw = _shift_sum(s3, w)
    qv = qv_ref[0]
    kv = kv_ref[0]
    logits = _logits(raw, qv, kv)
    p = jnp.exp(logits - lse_ref[0])
    gt = gt_ref[0]                                     # (D, BQ)
    dvt_s[:] = dvt_s[:] + _dot3(gt, p, ((1,), (0,)))   # (D, BK)
    dp = _dot3(gt, vt_ref[0], ((0,), (0,)))            # (BQ, BK)
    gl = p * (dp - dd_ref[0])
    qs = qv[:, 0:1]
    ks = kv[0:1, :]
    da = gl * qs * ks
    dks = jnp.sum(gl * logits, axis=0, keepdims=True) / ks
    dkmul = -jnp.sum(da * qv[:, 1:2], axis=0, keepdims=True)
    dkadd = jnp.sum(da, axis=0, keepdims=True)
    dkv_s[:] = dkv_s[:] + jnp.concatenate(
        [dks, dkmul, dkadd, jnp.zeros_like(dkadd)], axis=0)
    ds3 = _unshift_sum(da, w)
    fq = fqh_ref[0].astype(jnp.float32) + fql_ref[0].astype(jnp.float32)
    dg_s[:] = dg_s[:] + _dot3(ds3, fq, ((0,), (0,)))   # (BK, C3)

    @pl.when(iq == nq - 1)
    def _():
        dg_ref[0] = dg_s[:]
        dkv_ref[0] = dkv_s[:]
        dvt_ref[0] = dvt_s[:]


def _bwd(f3h, f3l, g3h, g3l, vt, qv, kv, w, lse, dd, gt):
    b, nq, c3 = f3h.shape
    nk = g3h.shape[1]
    d = vt.shape[1]
    r = _block_rows_bwd(w)
    bq = min(r * w, nq)
    bk = min(r * w, nk)

    df, dqv = pl.pallas_call(
        functools.partial(_dq_kernel, w),
        grid=(b, nq // bq, nk // bk),
        in_specs=[
            pl.BlockSpec((1, bq, c3), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, c3), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c3), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c3), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, iq, ik: (ib, 0, ik)),
            pl.BlockSpec((1, bq, 4), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, 4, bk), lambda ib, iq, ik: (ib, 0, ik)),
            pl.BlockSpec((1, d, bq), lambda ib, iq, ik: (ib, 0, iq)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, c3), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 4), lambda ib, iq, ik: (ib, iq, 0)),
        ),
        out_shape=(
            _out_struct((b, nq, c3), jnp.float32, f3h, g3h, vt, gt),
            _out_struct((b, nq, 4), jnp.float32, f3h, g3h, vt, gt),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, c3), jnp.float32),
            pltpu.VMEM((bq, 4), jnp.float32),
        ],
        interpret=_interpret(),
    )(f3h, f3l, g3h, g3l, vt, qv, kv, gt, lse, dd)

    dg, dkv, dvt = pl.pallas_call(
        functools.partial(_dk_kernel, w),
        grid=(b, nk // bk, nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c3), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bq, c3), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c3), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c3), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, d, bk), lambda ib, ik, iq: (ib, 0, ik)),
            pl.BlockSpec((1, bq, 4), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, 4, bk), lambda ib, ik, iq: (ib, 0, ik)),
            pl.BlockSpec((1, d, bq), lambda ib, ik, iq: (ib, 0, iq)),
            pl.BlockSpec((1, bq, 1), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda ib, ik, iq: (ib, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, c3), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, 4, bk), lambda ib, ik, iq: (ib, 0, ik)),
            pl.BlockSpec((1, d, bk), lambda ib, ik, iq: (ib, 0, ik)),
        ),
        out_shape=(
            _out_struct((b, nk, c3), jnp.float32, f3h, g3h, vt, gt),
            _out_struct((b, 4, nk), jnp.float32, f3h, g3h, vt, gt),
            _out_struct((b, d, nk), jnp.float32, f3h, g3h, vt, gt),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, c3), jnp.float32),
            pltpu.VMEM((4, bk), jnp.float32),
            pltpu.VMEM((d, bk), jnp.float32),
        ],
        interpret=_interpret(),
    )(f3h, f3l, g3h, g3l, vt, qv, kv, gt, lse, dd)
    return df, dg, dvt, dqv, dkv


# --------------------------------------------------------------- custom vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _core(f3: Array, g3: Array, vt: Array, qv: Array, kv: Array,
          w: int) -> Array:
    f3h, f3l = _split_bf16(f3)
    g3h, g3l = _split_bf16(g3)
    o, _ = _fwd(f3h, f3l, g3h, g3l, vt, qv, kv, w)
    return o


def _core_fwd(f3, g3, vt, qv, kv, w):
    f3h, f3l = _split_bf16(f3)
    g3h, g3l = _split_bf16(g3)
    o, lse = _fwd(f3h, f3l, g3h, g3l, vt, qv, kv, w)
    return o, (f3h, f3l, g3h, g3l, vt, qv, kv, lse, o)


def _core_bwd(w, res, g):
    f3h, f3l, g3h, g3l, vt, qv, kv, lse, o = res
    dd = jnp.sum(g * o, axis=-1, keepdims=True)
    gt = jnp.swapaxes(g, 1, 2)
    df, dg, dvt, dqv, dkv = _bwd(f3h, f3l, g3h, g3l, vt, qv, kv, w,
                                 lse, dd, gt)
    return df, dg, dvt, dqv, dkv


_core.defvjp(_core_fwd, _core_bwd)


# ------------------------------------------------------------------ public

def _row_stack3(x: Array) -> Array:
    """F3(h,w) = [f(h-1,w) | f(h,w) | f(h+1,w)], zero-padded rows."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return jnp.concatenate([xp[:, dy:dy + h] for dy in range(3)], axis=-1)


def shift9_supported(h: int, w: int, c: int) -> bool:
    """TPU lowering constraints: lane-dim multiples + whole-row blocks."""
    return ((3 * c) % 128 == 0 and w % 64 == 0
            and h % _block_rows(w) == 0 and h % _block_rows_bwd(w) == 0)


def attend_shift9(f: Array, g: Array, v: Array, tau: float,
                  pono_c: bool = True) -> Array:
    """Fused softmax(corr/tau) @ v over centered+normalized 3x3-unfold
    descriptors, from the raw (B,H,W,C) theta/phi features. Matches
    ops/corr_shift.attend_unfold (and thus the reference descriptor path)
    to ~1e-5."""
    from cocosnet_tpu.ops.corr_shift import (_safe_norm, _shift_means,
                                             _cross_map, _unfold_stats,
                                             _pad_hw)
    b, h, w, c = f.shape
    n = h * w
    cd = c * 9
    f = f.astype(jnp.float32)
    g = g.astype(jnp.float32)
    v = v.astype(jnp.float32)

    fs1, fs2 = _unfold_stats(f, 3)
    gs1, gs2 = _unfold_stats(g, 3)
    if pono_c:
        q_mu = (fs1 / cd).reshape(b, n)
        k_mu = (gs1 / cd).reshape(b, n)
        q_norm = _safe_norm((fs2 - fs1 * fs1 / cd).reshape(b, n))
        k_norm = _safe_norm((gs2 - gs1 * gs1 / cd).reshape(b, n))
        zero = jnp.zeros_like(q_mu)
        #   logits = (raw - (cd qmu) kmu) / (qn kn tau)
        qv = jnp.stack([1.0 / (q_norm * tau), cd * q_mu, zero, zero], -1)
        kv = jnp.stack([1.0 / k_norm, k_mu, jnp.zeros_like(k_mu),
                        jnp.zeros_like(k_mu)], 1)
    else:
        fp = _pad_hw(f, 1)
        gp = _pad_hw(g, 1)
        f_bar = _shift_means(fp, 3, h, w)
        g_bar = _shift_means(gp, 3, h, w)
        ca = _cross_map(fp, g_bar, 3, h, w).reshape(b, n)
        cb = _cross_map(gp, f_bar, 3, h, w).reshape(b, n)
        const = jnp.einsum("bsc,bsc->b", f_bar, g_bar)
        aa = _cross_map(fp, f_bar, 3, h, w).reshape(b, n)
        bb = _cross_map(gp, g_bar, 3, h, w).reshape(b, n)
        q_norm = _safe_norm(fs2.reshape(b, n) - 2 * aa
                            + jnp.einsum("bsc,bsc->b", f_bar, f_bar)[:, None])
        k_norm = _safe_norm(gs2.reshape(b, n) - 2 * bb
                            + jnp.einsum("bsc,bsc->b", g_bar, g_bar)[:, None])
        #   logits = (raw - ca - cb + const) / (qn kn tau)
        qv = jnp.stack([1.0 / (q_norm * tau), jnp.zeros_like(ca), -ca,
                        jnp.broadcast_to(const[:, None], ca.shape)], -1)
        kv = jnp.stack([1.0 / k_norm, jnp.zeros_like(cb), -cb,
                        jnp.zeros_like(cb)], 1)

    f3 = _row_stack3(f).reshape(b, n, 3 * c)
    g3 = _row_stack3(g).reshape(b, n, 3 * c)
    vt = jnp.swapaxes(v, 1, 2)
    out = _core(f3, g3, vt, qv, kv, w)
    return out
