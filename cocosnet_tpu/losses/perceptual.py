"""VGG perceptual losses (reference loss.py:101-120 and the fm/perc terms of
pix2pix_model.py:248-257).

`vgg_feature_matching` is the classic 5-slice VGGLoss (weights
[1/32..1]); the shipped CoCosNet pipeline uses the weighted per-sample
variant assembled in pix2pix.compute_generator_losses, but the standalone
loss is part of the reference API surface (loss.py:101-120)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

VGG_FM_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_feature_matching(x_feats: Sequence[Array], y_feats: Sequence[Array],
                         weights: Sequence[float] = VGG_FM_WEIGHTS) -> Array:
    """VGGLoss.forward (loss.py:112-120): weighted L1 over feature slices,
    targets detached."""
    loss = 0.0
    for w, xf, yf in zip(weights, x_feats, y_feats):
        loss = loss + w * jnp.mean(jnp.abs(xf - jax.lax.stop_gradient(yf)))
    return loss


def perceptual_mse(x_feat: Array, y_feat: Array) -> Array:
    """relu5_2/4_2 MSE perceptual term (pix2pix_model.py:256-257)."""
    return jnp.mean((x_feat - jax.lax.stop_gradient(y_feat)) ** 2)
