"""Shift-decomposed correlation for patch descriptors (match_kernel > 1).

The reference builds k*k-unfolded descriptors (C' = C*k*k = 2304 for the
flagship match_kernel=3) and computes the dense N x N correlation against
them (correspondence.py:276-291) — 9x the matmul FLOPs of the base C=256
correlation. But the unfold dot product decomposes exactly:

    R(n, m) = desc_f(n) . desc_g(m) = sum_{s in kxk} f(n+s) . g(m+s)
            = sum_s S(n+s, m+s),    S(a, b) = f(a) . g(b)

i.e. the patch-descriptor correlation is the base C-channel correlation
summed over k*k diagonal shifts. Computing S once on zero-padded feature
maps (padding makes the flattened-index shift arithmetic exact and absorbs
the unfold zero-padding) cuts matmul FLOPs ~6.5x; the descriptor centering
and L2 normalization (correspondence.py:277-289) become closed-form rank-1
corrections from cheap per-position box sums:

    PONO_C  (center over descriptor dim):
        R~(n,m) = R(n,m) - C' mu_f(n) mu_g(m)
        mu_f(n) = box_k(sum_c f)(n) / C'
        |desc~|^2 = box_k(sum_c f^2)(n) - C' mu^2
    spatial (center over positions):
        R~(n,m) = R(n,m) - a(n).gbar - fbar.b(m) + fbar.gbar
        with fbar/gbar the per-shift spatial descriptor means.

The whole pipeline (base matmul -> 9-shift sum -> corrections -> softmax ->
@V) streams over query row-blocks under a checkpointed lax.map, so at most
a block-row of logits is live — forward AND backward (autodiff recomputes
per block). This replaces both attend_chunked (XLA, full 2304-dim matmuls)
and the bigc Pallas kernel on the flagship path, and is the production
correlation for training and inference at match_kernel>1.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = sys.float_info.epsilon
_PRECISION = jax.lax.Precision.HIGH


def _pad_hw(x: Array, p: int) -> Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))


def _box_sum(x: Array, k: int) -> Array:
    """(B, H, W) -> (B, H, W): sum over the k x k neighborhood, zero-padded
    (matches F.unfold's padding=k//2 zeros entering the descriptor)."""
    b, h, w = x.shape
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p)))
    return sum(xp[:, dy:dy + h, dx:dx + w]
               for dy in range(k) for dx in range(k))


def _safe_norm(sq: Array) -> Array:
    """sqrt(||x||^2 + 1e-24) + eps, matching safe_l2_norm + _EPS on the
    descriptor path (models/correspondence.py:43-54)."""
    return jnp.sqrt(jnp.maximum(sq, 0.0) + 1e-24) + _EPS


def _shift_means(fp: Array, k: int, h: int, w: int) -> Array:
    """Per-shift spatial means of the unfold descriptor: (B, k*k, C) where
    entry s = mean_n f(n+s) (zeros from unfold padding included)."""
    n = h * w
    rows = [jnp.sum(fp[:, dy:dy + h, dx:dx + w, :], axis=(1, 2)) / n
            for dy in range(k) for dx in range(k)]
    return jnp.stack(rows, axis=1)


def _cross_map(fp: Array, means: Array, k: int, h: int, w: int) -> Array:
    """(B, H, W): desc_f(n) . mbar for per-shift mean vectors `means`
    (B, k*k, C) — the spatial-centering cross term."""
    out = 0.0
    i = 0
    for dy in range(k):
        for dx in range(k):
            out = out + jnp.einsum(
                "bhwc,bc->bhw", fp[:, dy:dy + h, dx:dx + w, :], means[:, i])
            i += 1
    return out


def _unfold_stats(f: Array, k: int):
    """Per-position (sum, sumsq) of the k*k unfold descriptor entries."""
    s1 = _box_sum(jnp.sum(f, axis=-1), k)          # (B, H, W)
    s2 = _box_sum(jnp.sum(f * f, axis=-1), k)      # (B, H, W)
    return s1, s2


def attend_unfold(f: Array, g: Array, v: Array, tau: float,
                  match_kernel: int = 3, pono_c: bool = True,
                  row_chunk: int = 8) -> Array:
    """softmax_m(corr(n, m) / tau) @ v over centered, L2-normalized
    match_kernel-unfold descriptors of f (queries) and g (keys).

    f, g: (B, H, W, C) raw theta/phi 1x1-conv features (pre-unfold).
    v:    (B, H*W, D).
    Equivalent to attend(_descriptor(f), _descriptor(g), v, tau) with
    match_kernel>1 descriptors, at ~1/6.5 the matmul FLOPs.
    """
    k = match_kernel
    b, h, w, c = f.shape
    n = h * w
    cd = c * k * k
    p = k // 2
    hp, wp = h + 2 * p, w + 2 * p
    f = f.astype(jnp.float32)
    g = g.astype(jnp.float32)
    v = v.astype(jnp.float32)

    fp = _pad_hw(f, p)
    gp = _pad_hw(g, p)
    g_flat = gp.reshape(b, hp * wp, c)

    fs1, fs2 = _unfold_stats(f, k)
    gs1, gs2 = _unfold_stats(g, k)

    if pono_c:
        # centered over the descriptor dim: rank-1 mean correction
        q_mu = (fs1 / cd).reshape(b, n)
        k_mu = (gs1 / cd).reshape(b, n)
        q_norm = _safe_norm((fs2 - fs1 * fs1 / cd).reshape(b, n))
        k_norm = _safe_norm((gs2 - gs1 * gs1 / cd).reshape(b, n))

        def correct(raw, qc, qn):
            # raw: (B, Q, N); qc/qn: (B, Q)
            adj = raw - cd * qc[..., None] * k_mu[:, None, :]
            return adj / (qn[..., None] * k_norm[:, None, :])
        q_c1 = q_mu
    else:
        # centered over positions: 4-term rank-1 correction
        f_bar = _shift_means(fp, k, h, w)            # (B, k*k, C)
        g_bar = _shift_means(gp, k, h, w)
        ca = _cross_map(fp, g_bar, k, h, w).reshape(b, n)   # a(n) . gbar
        cb = _cross_map(gp, f_bar, k, h, w).reshape(b, n)   # fbar . b(m)
        const = jnp.einsum("bsc,bsc->b", f_bar, g_bar)      # fbar . gbar
        aa = _cross_map(fp, f_bar, k, h, w).reshape(b, n)   # a(n) . fbar
        bb = _cross_map(gp, g_bar, k, h, w).reshape(b, n)   # b(m) . gbar
        fbar_sq = jnp.einsum("bsc,bsc->b", f_bar, f_bar)
        gbar_sq = jnp.einsum("bsc,bsc->b", g_bar, g_bar)
        q_norm = _safe_norm(fs2.reshape(b, n) - 2 * aa + fbar_sq[:, None])
        k_norm = _safe_norm(gs2.reshape(b, n) - 2 * bb + gbar_sq[:, None])

        def correct(raw, qc, qn):
            adj = (raw - qc[..., None] - cb[:, None, :]
                   + const[:, None, None])
            return adj / (qn[..., None] * k_norm[:, None, :])
        q_c1 = ca

    # ---- stream over query row-blocks ------------------------------------
    r = row_chunk
    while h % r != 0:
        r -= 1
    n_chunks = h // r
    # pre-stack the haloed query rows per chunk: (n_chunks, B, r+2p, Wp, C)
    f_rows = jnp.stack([fp[:, i * r: i * r + r + 2 * p]
                        for i in range(n_chunks)])
    q_c1_rows = jnp.stack(
        [q_c1.reshape(b, h, w)[:, i * r:(i + 1) * r].reshape(b, r * w)
         for i in range(n_chunks)])
    q_norm_rows = jnp.stack(
        [q_norm.reshape(b, h, w)[:, i * r:(i + 1) * r].reshape(b, r * w)
         for i in range(n_chunks)])

    @jax.checkpoint
    def body(args):
        f_blk, qc, qn = args
        s = jnp.einsum("bqc,bkc->bqk", f_blk.reshape(b, -1, c), g_flat,
                       preferred_element_type=jnp.float32,
                       precision=_PRECISION)
        s5 = s.reshape(b, r + 2 * p, wp, hp, wp)
        raw = 0.0
        for dy in range(k):
            for dx in range(k):
                raw = raw + s5[:, dy:dy + r, dx:dx + w, dy:dy + h, dx:dx + w]
        raw = raw.reshape(b, r * w, n)
        logits = correct(raw, qc, qn) / tau
        prob = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", prob, v,
                          preferred_element_type=jnp.float32,
                          precision=_PRECISION)

    out = jax.lax.map(body, (f_rows, q_c1_rows, q_norm_rows))
    return jnp.moveaxis(out, 0, 1).reshape(b, n, v.shape[-1])
