"""Contextual loss (reference ContextualLoss.py:83-137).

Cosine-distance affinity between fake and exemplar VGG features:
  d       = 1 - X^T Y                     (after centering by Y's mean)
  d_bar   = d / (rowmin(d) + 1e-3)
  A       = softmax-like affinity exp((1-d_bar)/h) row-normalized
  CX      = mean_i max_j A_ij ;  loss = -log CX   (per sample)

The affinity matrices are at most 1024x1024 at 256px input (r3_2 avg-pooled,
r4_2, r5_2; pix2pix_model.py:196-203), so the dense jnp form maps cleanly
onto the MXU without a custom kernel.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = sys.float_info.epsilon


def contextual_loss(x_features: Array, y_features: Array, h: float = 0.1,
                    feature_centering: bool = True, pono: bool = False) -> Array:
    """NHWC feature maps -> per-sample loss (B,).

    Matches ContextualLoss_forward.forward (ContextualLoss.py:93-137); the
    reference input is NCHW — ours is NHWC with the channel dim last.
    """
    b, hh, ww, c = x_features.shape
    if feature_centering:
        if pono:
            # center by Y's channel-dim mean at each position
            # (ContextualLoss.py:105-107)
            y_mean = jnp.mean(y_features, axis=-1, keepdims=True)
        else:
            # center by Y's per-channel global mean (ContextualLoss.py:109-110)
            y_mean = jnp.mean(y_features, axis=(1, 2), keepdims=True)
        x_features = x_features - y_mean
        y_features = y_features - y_mean

    def flat_norm(f):
        norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-24)
        f = f / (norm + _EPS)
        return f.reshape(b, -1, c)

    x = flat_norm(x_features)   # (B, N, C)
    y = flat_norm(y_features)   # (B, M, C)
    d = 1.0 - jnp.einsum("bnc,bmc->bnm", x, y,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGH)
    # d = 1 - cos >= 0 mathematically; enforce it against matmul rounding.
    # Without this, TPU bf16 rounding can push cos ~1e-2 past 1, making
    # min(d) + 1e-3 NEGATIVE — then d_norm is hugely negative for the other
    # entries and exp((1-d_norm)/h) overflows to inf -> inf/inf = NaN. This
    # killed training ~5 steps after the fake started matching the exemplar
    # (the trajectory-parity harness caught it; the reference never hits it
    # because f32 CUDA rounding stays ~1e-7). With d >= 0 the denominator is
    # >= 1e-3 and w <= e^10: every downstream term is bounded.
    d = jnp.maximum(d, 0.0)
    d_norm = d / (jnp.min(d, axis=-1, keepdims=True) + 1e-3)
    w = jnp.exp((1.0 - d_norm) / h)
    # guard: with degenerate (near-zero) features d_norm explodes and every
    # w in a row underflows to 0 -> 0/0 NaN; healthy features are unaffected
    a_ij = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-12)
    cx = jnp.mean(jnp.max(a_ij, axis=-1), axis=1)
    # guard: CX can underflow to 0 with degenerate features; the reference
    # would emit inf here (ContextualLoss.py:133) — clamp for stability
    return -jnp.log(jnp.maximum(cx, 1e-12))
