"""GAN losses (reference loss.py:15-97): hinge (default), ls, original
(BCE-with-logits), wgan; multiscale-list aware.

Returns scalars; the reference averages per-sample then over the batch
(loss.py:92-95), which equals a plain mean for equal-sized patch maps.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Pred = Union[Array, Sequence]


def _single_loss(x: Array, target_is_real: bool, for_discriminator: bool,
                 gan_mode: str) -> Array:
    x = x.astype(jnp.float32)
    if gan_mode == "original":
        target = jnp.ones_like(x) if target_is_real else jnp.zeros_like(x)
        return jnp.mean(optax_sigmoid_bce(x, target))
    if gan_mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((x - target) ** 2)
    if gan_mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(x - 1, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1, 0.0))
        assert target_is_real, "generator hinge loss aims for real"
        return -jnp.mean(x)
    # wgan
    return -jnp.mean(x) if target_is_real else jnp.mean(x)


def optax_sigmoid_bce(logits: Array, labels: Array) -> Array:
    # F.binary_cross_entropy_with_logits
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def gan_loss(pred: Pred, target_is_real: bool, for_discriminator: bool,
             gan_mode: str = "hinge") -> Array:
    """Multiscale-aware GANLoss.__call__ (loss.py:83-97): for a list input,
    take each scale's final logit map and average the per-scale losses."""
    if isinstance(pred, (list, tuple)):
        total = 0.0
        for pred_i in pred:
            if isinstance(pred_i, (list, tuple)):
                pred_i = pred_i[-1]
            total = total + _single_loss(pred_i, target_is_real,
                                         for_discriminator, gan_mode)
        return total / len(pred)
    return _single_loss(pred, target_is_real, for_discriminator, gan_mode)


def feature_matching_loss(pred_fake: List[List[Array]],
                          pred_real: List[List[Array]]) -> Array:
    """GAN_Feat: L1 on intermediate D features, all scales, excluding the
    final logit map (pix2pix_model.py:236-246). Returns the unweighted sum
    divided by num_D (the reference multiplies by lambda_feat / num_D)."""
    num_d = len(pred_fake)
    loss = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            diff = (pred_fake[i][j].astype(jnp.float32)
                    - jax.lax.stop_gradient(
                        pred_real[i][j].astype(jnp.float32)))
            loss = loss + jnp.mean(jnp.abs(diff))
    return loss / num_d


def weighted_l1_loss(x: Array, target: Array, weights: Array) -> Array:
    """util/util.py:36-40 — |x-t| scaled by per-sample weights then meaned."""
    return jnp.mean(jnp.abs(x.astype(jnp.float32)
                            - target.astype(jnp.float32)) * weights)


def mse_loss(x: Array, target: Array = 0.0) -> Array:
    return jnp.mean((x - target) ** 2)


def kld_loss(mu: Array, logvar: Array) -> Array:
    """loss.py:124-126 (unused in the shipped pipeline; kept for parity)."""
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
