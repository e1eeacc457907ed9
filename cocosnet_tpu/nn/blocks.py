"""Composite network blocks: SPADE resblock, SAGAN self-attention, SE layer,
and the correspondence residual block.

Parity citations into /root/reference/models/networks/:
- SPADEResnetBlock: architecture.py:19-95 (reflection-padded 3x3 convs,
  SPADE-normalized learned shortcut when fin != fout, LeakyReLU(0.2)).
- Attention: architecture.py:97-127 (theta/phi/g 1x1 convs, phi & g
  max-pooled 2x2, learnable gamma gate initialized to 0).
- SELayer: architecture.py:183-198.
- ResidualBlock (correspondence feature stack): correspondence.py:13-36
  (ReflectionPad -> Conv -> InstanceNorm -> PReLU, twice, +skip, PReLU).
- ResnetBlock (pix2pixHD-style): architecture.py:131-147.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from cocosnet_tpu.nn.layers import Conv2d, PReLU, leaky_relu, reflect_pad_2d
from cocosnet_tpu.nn.norms import SPADE, instance_norm
from cocosnet_tpu.ops.image import max_pool

Array = jax.Array


class SPADEResnetBlock(nn.Module):
    """architecture.py:19-95. `spade_ic` is the conditioning-map channel count
    (the reference smuggles it through opt.spade_ic / CBN_intype,
    architecture.py:55-58 — here it is an explicit constructor arg)."""
    fin: int
    fout: int
    spade_config: str          # e.g. 'spadesyncbatch3x3' (norm_G sans 'spectral')
    spade_ic: int
    use_spectral: bool = True
    eqlr_sn: bool = False
    pono: bool = False
    use_se: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array, seg: Array, train: bool = True) -> Array:
        fmiddle = min(self.fin, self.fout)
        wn = None
        if self.use_spectral:
            wn = "equal_lr" if self.eqlr_sn else "spectral"

        # all SPADE norms in this block run at x's resolution: resize the
        # conditioning map once here instead of once per norm (SPADE's own
        # resize then no-ops)
        from cocosnet_tpu.ops.image import resize_nearest
        seg = resize_nearest(seg, x.shape[1], x.shape[2])

        learned_shortcut = self.fin != self.fout
        if learned_shortcut:
            x_s = SPADE(self.spade_config, self.fin, self.spade_ic,
                        pono=self.pono, name="norm_s")(x, seg, train)
            x_s = Conv2d(self.fout, 1, use_bias=False, weight_norm=wn,
                         name="conv_s")(x_s)
        else:
            x_s = x

        dx = SPADE(self.spade_config, self.fin, self.spade_ic,
                   pono=self.pono, name="norm_0")(x, seg, train)
        dx = Conv2d(fmiddle, 3, padding=0, dilation=self.dilation,
                    weight_norm=wn, reflect_pad=True,
                    name="conv_0")(leaky_relu(dx))
        dx = SPADE(self.spade_config, fmiddle, self.spade_ic,
                   pono=self.pono, name="norm_1")(dx, seg, train)
        dx = Conv2d(self.fout, 3, padding=0, dilation=self.dilation,
                    weight_norm=wn, reflect_pad=True,
                    name="conv_1")(leaky_relu(dx))
        if self.use_se:
            dx = SELayer(self.fout, name="se_layar")(dx)
        return x_s + dx


class Attention(nn.Module):
    """SAGAN self-attention (architecture.py:97-127). The HW x HW/4 attention
    matrix maps onto the MXU as two batched matmuls + softmax; XLA fuses the
    surrounding reshapes."""
    ch: int
    use_sn: bool

    @nn.compact
    def __call__(self, x: Array) -> Array:
        wn = "spectral" if self.use_sn else None
        n, h, w, c = x.shape
        theta = Conv2d(c // 8, 1, use_bias=False, weight_norm=wn, name="theta")(x)
        phi = max_pool(Conv2d(c // 8, 1, use_bias=False, weight_norm=wn,
                              name="phi")(x), 2)
        g = max_pool(Conv2d(c // 2, 1, use_bias=False, weight_norm=wn,
                            name="g")(x), 2)
        theta = theta.reshape(n, h * w, c // 8)
        phi = phi.reshape(n, h * w // 4, c // 8)
        g = g.reshape(n, h * w // 4, c // 2)
        beta = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", theta, phi,
                       preferred_element_type=jnp.float32), axis=-1)
        o = jnp.einsum("nqk,nkc->nqc", beta.astype(g.dtype), g,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = Conv2d(self.ch, 1, use_bias=False, weight_norm=wn,
                   name="o")(o.reshape(n, h, w, c // 2))
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return (gamma.astype(x.dtype) * o.astype(x.dtype) + x)


class SELayer(nn.Module):
    """Squeeze-excitation (architecture.py:183-198)."""
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, C)
        from cocosnet_tpu.nn.layers import Dense
        y = Dense(self.channel // self.reduction, use_bias=False, name="fc_0")(y)
        y = jax.nn.relu(y)
        y = Dense(self.channel, use_bias=False, name="fc_1")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :].astype(x.dtype)


class ResidualBlock(nn.Module):
    """Correspondence-net residual block (correspondence.py:13-36)."""
    channels: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.padding == (self.kernel_size - 1) // 2
        from cocosnet_tpu.nn.norms import instance_norm_apply
        prelu = PReLU(name="prelu")
        # conv + IN moments in one pass (ops/pallas_conv.py stats fusion on
        # TPU inference; jnp moments of the conv output elsewhere — same
        # math as instance_norm either way), then normalize+PReLU collapse
        # into one elementwise op XLA fuses into the next conv's read
        out, mean, var = Conv2d(self.channels, self.kernel_size, padding=0,
                                reflect_pad=True, name="conv1")(
                                    x, want_stats=True)
        out = prelu(instance_norm_apply(out, mean, var))
        out, mean, var = Conv2d(self.channels, self.kernel_size, padding=0,
                                reflect_pad=True, name="conv2")(
                                    out, want_stats=True)
        out = instance_norm_apply(out, mean, var) + x
        return prelu(out)


class ResnetBlock(nn.Module):
    """pix2pixHD resblock (architecture.py:131-147); kept for API parity —
    the shipped pipeline never instantiates it (SURVEY §2.11)."""
    dim: int
    norm_str: str = "spectralinstance"
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        from cocosnet_tpu.nn.norms import NormConv
        pw = (self.kernel_size - 1) // 2
        y = NormConv(self.dim, self.kernel_size, self.norm_str,
                     name="conv_0")(reflect_pad_2d(x, pw), train)
        y = jax.nn.relu(y)
        y = NormConv(self.dim, self.kernel_size, self.norm_str,
                     name="conv_1")(reflect_pad_2d(y, pw), train)
        return x + y
