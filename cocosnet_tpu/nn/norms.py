"""Normalization layers: instance norm, positional norm (PONO), cross-replica
batch norm, and SPADE.

TPU-native synchronized batch norm: the reference needs a patched
Synchronized-BatchNorm-PyTorch package with per-replica callbacks
(models/networks/normalization.py:10,49-53; trainers/pix2pix_trainer.py:24)
because torch DataParallel computes per-GPU statistics. Under pjit/jit with a
sharded batch axis, `jnp.mean` over the batch is a *global* mean — XLA inserts
the cross-replica all-reduce automatically — so synchronized statistics fall
out of the programming model with zero extra code.

Parity notes:
- InstanceNorm2d: biased variance, eps 1e-5, affine=False (torch defaults;
  used at correspondence.py:19,23 and via 'spectralinstance' norm_E/norm_D).
- PositionalNorm2d: channel-dim mean and *unbiased* variance
  (normalization.py:63-68 uses x.var which is unbiased in torch).
- BatchNorm: biased variance for normalization, unbiased for the running
  update, momentum 0.1 (torch convention new = (1-m)*run + m*batch).
- SPADE: param-free norm, then gamma/beta from a 128-hidden reflection-padded
  conv MLP over the nearest-resized conditioning map; out = x̂*(1+γ)+β
  (normalization.py:83-151).
"""

from __future__ import annotations

import re
import jax
import jax.numpy as jnp
from flax import linen as nn

from cocosnet_tpu.nn.layers import Conv2d
from cocosnet_tpu.ops.image import resize_nearest

Array = jax.Array


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """nn.InstanceNorm2d(affine=False): per-sample, per-channel spatial norm.
    Statistics always in f32 (bf16 accumulation over 64k pixels is lossy);
    output keeps the input dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)  # biased, like torch IN
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def instance_norm_apply(x: Array, mean: Array, var: Array,
                        eps: float = 1e-5) -> Array:
    """instance_norm with precomputed moments — the apply half when the
    statistics came fused out of the conv kernel (ops/pallas_conv.py
    conv3x3_fused_stats). One elementwise pass; XLA fuses it into the
    consumer."""
    x32 = x.astype(jnp.float32)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def positional_norm(x: Array, eps: float = 1e-5) -> Array:
    """PONO (normalization.py:63-68): normalize over the channel dim at every
    spatial position. torch .var() is unbiased — match it. Statistics in
    f32; output keeps the input dtype."""
    c = x.shape[-1]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True) * (c / max(c - 1, 1))
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


class BatchNorm(nn.Module):
    """Synchronized batch norm via global-batch statistics.

    train: normalize with the (globally reduced) batch mean/var and update
    running stats; eval: use running stats. Replaces SynchronizedBatchNorm2d
    (normalization.py:49-53) — under pjit the batch mean IS the cross-replica
    mean, so no callback machinery is needed.
    """
    features: int
    affine: bool = True
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            n = x.size // x.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = ((x.astype(jnp.float32) - mean)
             * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            # torch BN affine init: weight=1 (the reference's init_weights only
            # re-inits *BatchNorm2d* modules named so; ours start at the same 1/0)
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
        return y


def parse_spade_config(config_text: str):
    """spade(norm)(ks) -> (param_free_norm_type, kernel_size)
    (normalization.py:87-90)."""
    m = re.search(r"spade(\D+)(\d)x\d", config_text)
    return str(m.group(1)), int(m.group(2))


class SPADE(nn.Module):
    """Spatially-adaptive denormalization (normalization.py:83-151).

    norm_nc: channels of x; label_nc: channels of the conditioning map.
    """
    config_text: str
    norm_nc: int
    label_nc: int
    pono: bool = False

    @nn.compact
    def __call__(self, x: Array, segmap: Array, train: bool = True) -> Array:
        norm_type, ks = parse_spade_config(self.config_text)
        if self.pono:
            normalized = positional_norm(x)
        elif norm_type == "instance":
            normalized = instance_norm(x)
        elif norm_type in ("syncbatch", "batch"):
            normalized = BatchNorm(self.norm_nc, affine=False,
                                   name="param_free_norm")(x, train)
        else:
            raise ValueError(f"unrecognized SPADE param-free norm {norm_type}")

        nhidden = 128
        seg = resize_nearest(segmap, x.shape[1], x.shape[2])
        actv = Conv2d(nhidden, ks, padding=0, reflect_pad=True,
                      name="mlp_shared")(seg)
        actv = jax.nn.relu(actv)
        gamma = Conv2d(self.norm_nc, ks, padding=0, reflect_pad=True,
                       name="mlp_gamma")(actv)
        beta = Conv2d(self.norm_nc, ks, padding=0, reflect_pad=True,
                      name="mlp_beta")(actv)
        out = normalized.astype(gamma.dtype) * (1 + gamma) + beta
        return out


class NormConv(nn.Module):
    """get_nonspade_norm_layer equivalent (normalization.py:21-61): a conv
    wrapped with optional spectral/equal-lr weight norm and a parameter-free
    activation norm. The conv bias is dropped when a norm follows
    (normalization.py:41-45).

    norm_str examples: 'spectralinstance', 'spectralsync_batch', 'instance',
    'spectral', 'none'.
    """
    features: int
    kernel_size: int
    norm_str: str = "spectralinstance"
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    eqlr_sn: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        norm_str = self.norm_str
        weight_norm = None
        if norm_str.startswith("spectral"):
            weight_norm = "equal_lr" if self.eqlr_sn else "spectral"
            norm_str = norm_str[len("spectral"):]
        has_subnorm = norm_str not in ("", "none")
        conv = Conv2d(self.features, self.kernel_size, stride=self.stride,
                      padding=self.padding, dilation=self.dilation,
                      use_bias=not has_subnorm, weight_norm=weight_norm,
                      name="conv")
        if norm_str == "instance":
            # conv + IN moments in one kernel pass where supported
            # (ops/pallas_conv.conv3x3_fused_stats); jnp moments of the
            # conv output elsewhere — identical math to instance_norm
            y, mean, var = conv(x, want_stats=True)
            y = instance_norm_apply(y, mean, var)
        elif norm_str in ("batch", "sync_batch"):
            y = conv(x)
            y = BatchNorm(self.features, affine=True, name="norm")(y, train)
        elif has_subnorm:
            raise ValueError(f"normalization layer {norm_str} is not recognized")
        else:
            y = conv(x)
        return y
