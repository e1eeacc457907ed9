"""SPADE generator, adaptive-feature domain adaptor, domain classifier.

Parity citations into /root/reference/models/networks/generator.py:
- SPADEGenerator: lines 17-89. 3x3 `fc` conv on the nearest-downsampled
  conditioning map at crop/2^5 resolution, 7 SPADE resblocks with x2 nearest
  upsampling, optional SAGAN attention at 4nf, tanh head.
- AdaptiveFeatureGenerator: lines 91-160. 5 norm_E convs (stride 2 at layers
  2 and 4 unless warp_stride==2) then 3 SPADE resblocks conditioned on the
  adaptor's own input; optional nonlocal/SE/deeper-dilated variants.
- DomainClassifier: lines 214-242 (built for the --weight_domainC domain-
  adversarial extension; the reference never calls its forward — SURVEY
  §2.11 — but the component is provided for full API parity).
- grad_reverse: ReverseLayerF (lines 244-256).

Everything is NHWC and functional; `train` toggles batch-stat/spectral-u
updates through flax collections rather than module mode flags.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cocosnet_tpu.config import Options
from cocosnet_tpu.nn.blocks import Attention, SPADEResnetBlock
from cocosnet_tpu.nn.layers import Conv2d, Dense, leaky_relu
from cocosnet_tpu.nn.norms import BatchNorm, NormConv
from cocosnet_tpu.ops.image import resize_nearest, upsample_nearest

Array = jax.Array


def spade_config_str(opt: Options) -> str:
    return opt.norm_G.replace("spectral", "")


def remat_policy(opt: Options):
    """jax.checkpoint policy for the per-SPADE-block remat (--remat_policy).

    `block` saves only block inputs — the reference-parity memory floor.
    `conv`/`conv_small` save conv outputs tagged by nn.layers.conv2d
    (checkpoint_name), so the backward recomputes only elementwise/norm
    chains instead of re-running every conv on the MXU — less recompute at
    the price of keeping (some) conv activations live. The config default
    is `conv_small` (config.py Options.remat_policy): +5% train throughput
    over `block` at batch 12 --remat, measured round 4."""
    if opt.remat_policy in ("block", "", None):
        return None
    if opt.remat_policy == "conv":
        return jax.checkpoint_policies.save_only_these_names(
            "conv_small", "conv_large")
    if opt.remat_policy == "conv_small":
        return jax.checkpoint_policies.save_only_these_names("conv_small")
    raise ValueError(f"unknown --remat_policy {opt.remat_policy!r}")


def cbn_channels(opt: Options) -> int:
    """Channels of the SPADE conditioning input per --CBN_intype
    (generator.py:30, architecture.py:58)."""
    ic = 0
    if "warp" in opt.CBN_intype:
        ic += 3
    if "mask" in opt.CBN_intype:
        ic += opt.semantic_nc
    return ic


class SPADEGenerator(nn.Module):
    opt: Options

    @nn.compact
    def __call__(self, input_semantics: Array, warp_out: Optional[Array] = None,
                 train: bool = True) -> Array:
        opt = self.opt
        nf = opt.ngf
        seg = input_semantics if warp_out is None else warp_out
        from cocosnet_tpu.nn.layers import get_compute_dtype
        if get_compute_dtype() is not None:
            # one cast for the (B,H,W,semantic_nc+3) conditioning map: every
            # SPADE block resizes + convolves it, so keeping it in the
            # compute dtype halves that traffic
            seg = seg.astype(get_compute_dtype())
        sw = opt.crop_size // (2 ** 5)
        sh = round(sw / opt.aspect_ratio)
        use_sn = "spectral" in opt.norm_G
        cfg = spade_config_str(opt)
        ic = cbn_channels(opt)

        # --remat: rematerialize each SPADE block in the backward pass (only
        # block boundaries are saved). Much cheaper than checkpointing the
        # whole G forward: the conditioning-map resizes + 2-3 convs per block
        # are recomputed, the correlation is not. --remat_policy relaxes
        # what is saved inside each block.
        Block = (nn.remat(SPADEResnetBlock, static_argnums=(2,),
                          policy=remat_policy(opt))
                 if opt.remat else SPADEResnetBlock)

        def block(fin, fout, name):
            return Block(fin, fout, cfg, ic, use_spectral=use_sn,
                         eqlr_sn=opt.eqlr_sn, pono=opt.PONO,
                         name=name)

        x = resize_nearest(seg, sh, sw)
        x = Conv2d(16 * nf, 3, padding=1,
                   weight_norm="equal_lr" if opt.eqlr_sn else None,
                   name="fc")(x)
        x = block(16 * nf, 16 * nf, "head_0")(x, seg, train)
        x = upsample_nearest(x, 2)
        x = block(16 * nf, 16 * nf, "G_middle_0")(x, seg, train)
        x = block(16 * nf, 16 * nf, "G_middle_1")(x, seg, train)
        x = upsample_nearest(x, 2)
        x = block(16 * nf, 8 * nf, "up_0")(x, seg, train)
        x = upsample_nearest(x, 2)
        x = block(8 * nf, 4 * nf, "up_1")(x, seg, train)
        x = upsample_nearest(x, 2)
        if opt.use_attention:
            x = Attention(4 * nf, use_sn, name="attn")(x)
        x = block(4 * nf, 2 * nf, "up_2")(x, seg, train)
        x = upsample_nearest(x, 2)
        x = block(2 * nf, 1 * nf, "up_3")(x, seg, train)
        x = Conv2d(3, 3, padding=1, name="conv_img")(leaky_relu(x))
        return jnp.tanh(x.astype(jnp.float32))


class AdaptiveFeatureGenerator(nn.Module):
    """Domain adaptor mapping a (semantic map | RGB image) into the shared
    correspondence domain at 1/4 resolution, 4nf=256 channels."""
    opt: Options
    spade_ic: int  # conditioning/input channels (semantic_nc or 3)

    @nn.compact
    def __call__(self, x: Array, seg: Array, train: bool = True) -> Array:
        opt = self.opt
        from cocosnet_tpu.nn.layers import get_compute_dtype
        if get_compute_dtype() is not None:
            x = x.astype(get_compute_dtype())
            seg = seg.astype(get_compute_dtype())
        ndf = nf = opt.ngf
        kw, pw = 3, 1
        ak = opt.adaptor_kernel
        use_sn = "spectral" in opt.norm_G
        cfg = spade_config_str(opt)

        def nconv(feat, ks, stride, name, dilation=1, pad=None):
            return NormConv(feat, ks, opt.norm_E, stride=stride,
                            padding=pw if pad is None else pad,
                            dilation=dilation, eqlr_sn=opt.eqlr_sn, name=name)

        h = nconv(ndf, kw, 1, "layer1")(x, train)
        h = nconv(ndf * 2, ak, 2, "layer2")(leaky_relu(h), train)
        h = nconv(ndf * 4, kw, 1, "layer3")(leaky_relu(h), train)
        if opt.warp_stride == 2:
            h = nconv(ndf * 8, kw, 1, "layer4")(leaky_relu(h), train)
        else:
            h = nconv(ndf * 8, ak, 2, "layer4")(leaky_relu(h), train)
        h = nconv(ndf * 8, kw, 1, "layer5")(leaky_relu(h), train)

        Block = (nn.remat(SPADEResnetBlock, static_argnums=(2,),
                          policy=remat_policy(opt))
                 if opt.remat else SPADEResnetBlock)

        def block(fin, fout, name, use_se=False, dilation=1):
            return Block(fin, fout, cfg, self.spade_ic,
                         use_spectral=use_sn, eqlr_sn=opt.eqlr_sn,
                         pono=opt.PONO, use_se=use_se,
                         dilation=dilation, name=name)

        h = block(8 * nf, 8 * nf, "head_0", use_se=opt.adaptor_se)(h, seg, train)
        if opt.adaptor_nonlocal:
            h = Attention(8 * nf, False, name="attn")(h)
        h = block(8 * nf, 8 * nf, "G_middle_0", use_se=opt.adaptor_se)(h, seg, train)
        h = block(8 * nf, 4 * nf, "G_middle_1", use_se=opt.adaptor_se)(h, seg, train)
        if opt.adaptor_res_deeper:
            h = block(4 * nf, 4 * nf, "deeper0")(h, seg, train)
            if opt.dilation_conv:
                h = block(4 * nf, 4 * nf, "deeper1", dilation=2)(h, seg, train)
                h = block(4 * nf, 4 * nf, "deeper2", dilation=4)(h, seg, train)
                h = nconv(ndf * 4, 3, 1, "degridding0", dilation=2, pad=2)(h, train)
                h = nconv(ndf * 4, 3, 1, "degridding1")(h, train)
            else:
                h = block(4 * nf, 4 * nf, "deeper1")(h, seg, train)
                h = block(4 * nf, 4 * nf, "deeper2")(h, seg, train)
        return h


class DomainClassifier(nn.Module):
    """generator.py:214-242 — domain-adversarial head (optional extension)."""
    opt: Options

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        opt = self.opt
        nf = opt.ngf
        kw = 4 if opt.domain_rela else 3
        pw = (kw - 1) // 2
        h = x
        for i, feat in enumerate([2 * nf, nf, nf // 2]):
            h = Conv2d(feat, kw, stride=2, padding=pw, name=f"feature_{i}")(h)
            h = BatchNorm(feat, affine=True, name=f"bn_{i}")(h, train)
            h = leaky_relu(h)
        # torch flattens NCHW (C,H,W); transpose so converted weights line up
        n = h.shape[0]
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(n, -1)
        h = Dense(100, name="fc0")(h)
        # SynchronizedBatchNorm1d on the 100-dim feature
        h = BatchNorm(100, affine=True, name="bn_fc")(h, train)
        h = jax.nn.relu(h)
        if opt.domain_rela:
            return Dense(1, name="fc1")(h)
        h = Dense(2, name="fc1")(h)
        return jax.nn.log_softmax(h, axis=1)


def grad_reverse(x: Array, alpha: float) -> Array:
    """ReverseLayerF (generator.py:244-256): identity forward, -alpha * grad
    backward — the GRL for the domain-adversarial extension."""
    @jax.custom_vjp
    def _rev(x):
        return x

    def _fwd(x):
        return x, None

    def _bwd(_, g):
        return (-alpha * g,)

    _rev.defvjp(_fwd, _bwd)
    return _rev(x)
