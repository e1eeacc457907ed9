"""Multiscale PatchGAN discriminator (reference discriminator.py:16-177).

- NLayerDiscriminator: 4x4 stride-2 spectral-norm convs, nf doubling to 512,
  stride 1 on the last inner layer, optional SAGAN attention before it and
  CAM global-pool logits (--D_cam).
- MultiscaleDiscriminator: num_D=2 PatchGANs; the input is downsampled
  between scales with avg_pool(3, 2, pad 1, count_include_pad=False).

The seg-decoder head `dec` that the reference builds but never uses
(discriminator.py:101-110,174; SURVEY §2.11) is intentionally omitted — the
torch checkpoint loader skips its weights (strict=False, util.py:246-249) and
so does our converter.

Returns per-scale lists of intermediate features; the final element of each
list is the patch logit map (feeds GANLoss and the GAN_Feat loss).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cocosnet_tpu.config import Options
from cocosnet_tpu.nn.blocks import Attention
from cocosnet_tpu.nn.layers import Conv2d, leaky_relu
from cocosnet_tpu.nn.norms import NormConv
from cocosnet_tpu.ops.image import (adaptive_avg_pool_1x1,
                                    adaptive_max_pool_1x1, avg_pool_3x3_s2_p1)

Array = jax.Array


class NLayerDiscriminator(nn.Module):
    opt: Options

    @nn.compact
    def __call__(self, x: Array, train: bool = True
                 ) -> Tuple[List[Array], Optional[Array]]:
        opt = self.opt
        kw, padw = 4, 1
        nf = opt.ndf
        n_layers = opt.n_layers_D
        # three stride-2 convs precede the final 4x4 conv: anything smaller
        # bottoms out at zero-size patch maps (and NaN hinge losses)
        assert min(x.shape[1], x.shape[2]) >= 4 * 2 ** (n_layers - 1), (
            f"discriminator input {x.shape[1]}x{x.shape[2]} too small for "
            f"n_layers_D={n_layers} (needs >= {4 * 2 ** (n_layers - 1)})")
        results = []
        cam_logit = None

        h = Conv2d(nf, kw, stride=2, padding=padw, name="model0_conv")(x)
        h = leaky_relu(h)
        results.append(h)

        for n in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            stride = 1 if n == n_layers - 1 else 2
            if opt.use_attention and n == n_layers - 1:
                h = Attention(nf_prev, "spectral" in opt.norm_D,
                              name="attn")(h)
            h = NormConv(nf, kw, opt.norm_D, stride=stride, padding=padw,
                         eqlr_sn=opt.eqlr_sn, name=f"model{n}_conv")(h, train)
            h = leaky_relu(h)
            if opt.D_cam > 0 and n == n_layers - 1:
                h, cam_logit = self._cam(h, nf)
            results.append(h)

        h = Conv2d(1, kw, stride=1, padding=padw,
                   name=f"model{n_layers}_conv")(h)
        results.append(h)
        return results, cam_logit

    def _cam(self, x: Array, nf: int) -> Tuple[Array, Array]:
        """CAM attention logits (discriminator.py:117-126, 153-166).

        The channel-attention maps use the raw (pre-spectral-norm) fc weight,
        matching `list(self.gap_fc.parameters())[0]` in the reference."""
        from cocosnet_tpu.nn.layers import xavier_normal_init, _spectral_sigma
        c = x.shape[-1]
        w_gap = self.param("gap_fc_kernel", xavier_normal_init(0.02), (c, 1))
        w_gmp = self.param("gmp_fc_kernel", xavier_normal_init(0.02), (c, 1))
        sig_gap = _spectral_sigma(self, w_gap.T, prefix="gap_fc_")
        sig_gmp = _spectral_sigma(self, w_gmp.T, prefix="gmp_fc_")

        gap = adaptive_avg_pool_1x1(x).reshape(x.shape[0], -1)
        gap_logit = gap @ (w_gap / sig_gap)
        gap_map = x * w_gap[None, None, None, :, 0]

        gmp = adaptive_max_pool_1x1(x).reshape(x.shape[0], -1)
        gmp_logit = gmp @ (w_gmp / sig_gmp)
        gmp_map = x * w_gmp[None, None, None, :, 0]

        cam_logit = jnp.concatenate([gap_logit, gmp_logit], axis=1)
        h = jnp.concatenate([gap_map, gmp_map], axis=-1)
        h = Conv2d(c, 1, name="conv1x1")(h)
        return leaky_relu(h), cam_logit


class MultiscaleDiscriminator(nn.Module):
    opt: Options

    @nn.compact
    def __call__(self, x: Array, train: bool = True
                 ) -> Tuple[List[List[Array]], List[Optional[Array]]]:
        opt = self.opt
        results, cam_logits = [], []
        h = x
        for i in range(opt.num_D):
            out, cam = NLayerDiscriminator(opt, name=f"discriminator_{i}")(
                h, train)
            results.append(out)
            cam_logits.append(cam)
            h = avg_pool_3x3_s2_p1(h)
        return results, cam_logits
