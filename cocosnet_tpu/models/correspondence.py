"""Cross-domain correspondence network (reference correspondence.py:148-374).

Computes dense correspondence between the input semantic layout and the
exemplar photo, then warps the exemplar (and optionally its mask / cycle
targets) through softmax attention over the HW x HW correlation.

TPU-native structure: instead of materializing the 4096x4096 correlation and
re-multiplying it per output (correspondence.py:291-372), every warp is an
`attend(q, k, V)` call where row-softmax paths share one V matrix and
column-softmax paths run the same kernel with q/k swapped:

    row pass V  = [ref_rgb | ref_onehot(direct mask)]            (one kernel)
    col pass V  = [seg(cycle mask) | y(warp_cycle) | real(two_cycle)]
    row pass 2  = [warp_mask_to_ref | warp_i2r]                  (cycle hops)

Kernel dispatch:
- match_kernel=3 (the flagship): the unfold correlation decomposes into 9
  diagonal shifts of the base C=256 correlation; on TPU the whole chain is
  ONE fused Pallas kernel (ops/pallas_shift9.py) with a flash-style custom
  VJP, used for training and inference. The 2304-dim descriptor tensors are
  never materialized. Off-TPU: the streaming XLA form (ops/corr_shift.py).
- match_kernel=1: the VMEM-resident-key Pallas kernel (ops/pallas_corr.py)
  at inference; XLA streaming attend in training.
- WTA scaling / return_corr: explicit-matrix path (materialized logits).
"""

from __future__ import annotations

import sys
import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cocosnet_tpu.config import Options
from cocosnet_tpu.models.generator import AdaptiveFeatureGenerator
from cocosnet_tpu.nn.blocks import ResidualBlock
from cocosnet_tpu.nn.layers import Conv2d
from cocosnet_tpu.ops import image as I
from cocosnet_tpu.ops.correlation import attend, wta_scale
from cocosnet_tpu.ops.corr_shift import attend_unfold
from cocosnet_tpu.ops.pallas_shift9 import attend_shift9, shift9_supported
from cocosnet_tpu.ops.image import resize_nearest

Array = jax.Array

_EPS = sys.float_info.epsilon


def safe_l2_norm(x: Array, axis=-1, keepdims=True) -> Array:
    """sqrt(sum(x^2) + tiny) in f32: forward-identical to torch.norm at any
    healthy magnitude, but with a finite gradient at exactly-zero vectors
    (which torch's pretrained VGG never produces, but random init can)."""
    x = x.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-24)


def feature_normalize(x: Array) -> Array:
    """util/util.py:31-34 — L2 normalize over the channel dim (NHWC), f32."""
    x = x.astype(jnp.float32)
    return x / (safe_l2_norm(x) + _EPS)


def add_coords(x: Array) -> Array:
    """CoordConv xx/yy/rr channels (correspondence.py:202-220), NHWC."""
    n, h, w, c = x.shape
    xx = jnp.broadcast_to(jnp.arange(w, dtype=x.dtype)[None, None, :, None],
                          (n, h, w, 1)) / (w - 1)
    yy = jnp.broadcast_to(jnp.arange(h, dtype=x.dtype)[None, :, None, None],
                          (n, h, w, 1)) / (h - 1)
    xx = 2 * xx - 1
    yy = 2 * yy - 1
    rr = jnp.sqrt(xx ** 2 + yy ** 2)
    return jnp.concatenate([x, xx, yy, rr], axis=-1)


class CorrespondenceNet(nn.Module):
    """NoVGGCorrespondence (correspondence.py:148-374)."""
    opt: Options

    def _descriptor(self, feat: Array, name: str) -> Array:
        """theta/phi 1x1 conv -> (B, N, C'), centered + L2 normalized
        (correspondence.py:272-289)."""
        opt = self.opt
        inter = 256
        y = Conv2d(inter, 1, padding=0, name=name)(feat)
        b, h, w, c = y.shape
        y = y.astype(jnp.float32)  # descriptor math stays f32 (tau=0.01)
        if opt.match_kernel == 1:
            desc = y.reshape(b, h * w, c)
        else:
            desc = I.unfold_descriptors(y, opt.match_kernel)  # (B, N, C*k*k)
        # PONO_C centers over the descriptor dim, else over spatial positions
        # (torch dim 1 == channels in (B, C', N) layout; dim -1 == positions)
        if opt.PONO_C:
            desc = desc - jnp.mean(desc, axis=-1, keepdims=True)
        else:
            desc = desc - jnp.mean(desc, axis=1, keepdims=True)
        return desc / (safe_l2_norm(desc) + _EPS)

    @nn.compact
    def __call__(self,
                 ref_img: Array,
                 real_img: Optional[Array],
                 seg_map: Array,
                 ref_seg_map: Array,
                 temperature: float = 0.01,
                 detach_flag: bool = False,
                 WTA_scale_weight: float = 1.0,
                 train: bool = True,
                 return_corr: bool = False,
                 seg_label: Optional[Array] = None) -> Dict[str, Array]:
        opt = self.opt
        out: Dict[str, Array] = {}
        b, ih, iw, _ = ref_img.shape
        fh, fw = ih // opt.down, iw // opt.down
        n = fh * fw

        # 1. optional mask noise (correspondence.py:239-244)
        if opt.mask_noise and train:
            noise = jax.random.normal(self.make_rng("noise"), seg_map.shape,
                                      seg_map.dtype) * 0.1
            seg_input = seg_map + jnp.where(seg_map == 0, 0.0, noise)
        else:
            seg_input = seg_map

        # 2. domain adaptors + channel L2 norm (correspondence.py:245-248)
        adaptor_seg = AdaptiveFeatureGenerator(opt, opt.semantic_nc,
                                               name="adaptive_model_seg")
        adaptor_img = AdaptiveFeatureGenerator(opt, 3,
                                               name="adaptive_model_img")
        # seg_label: integer class map whose one_hot IS seg_map exactly
        # (caller guarantees it — ade20k/flickr without mask noise). The
        # adaptor's first conv then streams the ~1.5 MB label map instead of
        # the ~118 MB dense one-hot (nn.layers.OneHotLabels -> Pallas
        # gather-conv); SPADE conditioning inside the adaptor stays dense.
        adaptor_x = seg_input
        if seg_label is not None and seg_input is seg_map:
            from cocosnet_tpu.nn.layers import OneHotLabels
            adaptor_x = OneHotLabels(seg_label, opt.semantic_nc,
                                     seg_map.dtype)
        feat_seg = feature_normalize(adaptor_seg(adaptor_x, seg_input, train))
        feat_img = feature_normalize(adaptor_img(ref_img, ref_img, train))
        out["adaptive_feature_seg"] = feat_seg
        out["adaptive_feature_img"] = feat_img

        # 3. train-only domain-alignment pair loss (correspondence.py:249-252)
        if train and opt.novgg_featpair > 0 and real_img is not None:
            feat_pair = feature_normalize(adaptor_img(real_img, real_img, train))
            out["loss_novgg_featpair"] = (
                jnp.mean(jnp.abs(feat_seg - feat_pair)) * opt.novgg_featpair)

        if opt.use_coordconv:
            feat_seg = add_coords(feat_seg)
            feat_img = add_coords(feat_img)

        # 4. maskmix + shared residual stack (correspondence.py:258-269)
        seg_small = resize_nearest(seg_map, fh, fw)
        ref_seg_small = resize_nearest(ref_seg_map, fh, fw)
        channels = feat_seg.shape[-1] + (opt.semantic_nc if opt.maskmix else 0)
        layer = nn.Sequential([ResidualBlock(channels, name=f"layer_{i}")
                               for i in range(4)])
        if opt.maskmix:
            cont_features = layer(jnp.concatenate([feat_seg, seg_small], -1))
            use_noise_for_mask = opt.noise_for_mask and (
                (not train) or (train and opt.epoch > opt.mask_epoch))
            if use_noise_for_mask:
                # the reference draws fresh torch.randn on every forward,
                # train AND eval (correspondence.py:262-264); callers thread a
                # "noise" rng through apply. The PRNGKey(0) fallback only
                # covers rng-less EVAL calls (deterministic by construction,
                # e.g. golden tests); a training caller that forgot the rng
                # would silently reuse the same noise every step, so error.
                if self.has_rng("noise"):
                    rng = self.make_rng("noise")
                elif train:
                    raise ValueError(
                        "noise_for_mask training requires rngs={'noise': ...}"
                        " in apply() — refusing the fixed-key fallback")
                else:
                    rng = jax.random.PRNGKey(0)
                noise = jax.random.normal(rng, ref_seg_small.shape,
                                          ref_seg_small.dtype) * 0.01
                ref_features = layer(jnp.concatenate([feat_img, noise], -1))
            else:
                ref_features = layer(
                    jnp.concatenate([feat_img, ref_seg_small], -1))
        else:
            cont_features = layer(feat_seg)
            ref_features = layer(feat_img)

        # 5. descriptors (correspondence.py:272-289)
        if WTA_scale_weight != 1 or return_corr:
            # explicit-matrix path for WTA scaling / correlation dumps
            if opt.mesh_model > 1:
                warnings.warn(
                    "--mesh_model > 1 has no spatial-parallel form of the "
                    "explicit-matrix correlation (WTA_scale_weight != 1 / "
                    "--show_corr): this path materializes the full HWxHW "
                    "matrix REPLICATED on every device in the model axis. "
                    "Results are correct but unsharded.", stacklevel=2)
            theta = self._descriptor(cont_features, "theta")   # (B, N, C')
            phi = self._descriptor(ref_features, "phi")        # (B, N, C')
            if detach_flag:
                theta = jax.lax.stop_gradient(theta)
                phi = jax.lax.stop_gradient(phi)
            f = jnp.einsum("bnc,bmc->bnm", theta, phi,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            if WTA_scale_weight != 1:
                f = wta_scale(f, WTA_scale_weight)
            f = f / temperature
            if return_corr:
                out["corr"] = f
                return out
            f_div_c = jax.nn.softmax(f, axis=-1)
            f_div_c_v = jax.nn.softmax(jnp.swapaxes(f, 1, 2), axis=-1)

            def row_attend(v):
                return jnp.einsum("bnm,bmd->bnd", f_div_c, v)

            def col_attend(v):
                return jnp.einsum("bmn,bnd->bmd", f_div_c_v, v)
        elif opt.match_kernel > 1:
            # Patch descriptors: the k*k-unfold correlation decomposes into
            # k*k diagonal shifts of the base C=256 correlation
            # (ops/corr_shift.py), so the 2304-dim descriptor tensors are
            # never materialized. On TPU the whole chain (base matmul ->
            # shift-sum -> centering/normalize corrections -> softmax ->
            # warp) is ONE fused Pallas kernel (ops/pallas_shift9.py) used
            # for training AND inference; elsewhere the XLA streaming form.
            y_theta = Conv2d(256, 1, padding=0, name="theta")(cont_features)
            y_phi = Conv2d(256, 1, padding=0, name="phi")(ref_features)
            y_theta = y_theta.astype(jnp.float32)
            y_phi = y_phi.astype(jnp.float32)
            if detach_flag:
                y_theta = jax.lax.stop_gradient(y_theta)
                y_phi = jax.lax.stop_gradient(y_phi)
            use_fused = (opt.use_pallas and opt.match_kernel == 3
                         and jax.default_backend() == "tpu"
                         and shift9_supported(fh, fw, 256))

            def _attend_nomat(q_feat, k_feat, v):
                if opt.mesh_model > 1:
                    # spatial-parallel: query rows sharded over the mesh's
                    # `model` axis (keys all-gathered over ICI, ppermute
                    # halos) — the product form of ops/corr_sp.py
                    from cocosnet_tpu.ops.corr_sp import attend_sp
                    return attend_sp(q_feat, k_feat, v, temperature,
                                     match_kernel=opt.match_kernel,
                                     pono_c=opt.PONO_C,
                                     use_pallas=opt.use_pallas,
                                     model=opt.mesh_model)
                if use_fused:
                    return attend_shift9(q_feat, k_feat, v, temperature,
                                         opt.PONO_C)
                return attend_unfold(q_feat, k_feat, v, temperature,
                                     opt.match_kernel, opt.PONO_C)

            def row_attend(v):
                return _attend_nomat(y_theta, y_phi, v)

            def col_attend(v):
                return _attend_nomat(y_phi, y_theta, v)
        elif opt.mesh_model > 1 and opt.PONO_C:
            # match_kernel=1 spatial-parallel: the unfold-SP path with k=1
            # reproduces _descriptor's PONO_C centering + L2 normalization
            # from box statistics (tests/test_mesh_model.py), so the raw
            # theta/phi conv outputs go straight into the sharded attend
            y_theta = Conv2d(256, 1, padding=0, name="theta")(cont_features)
            y_phi = Conv2d(256, 1, padding=0, name="phi")(ref_features)
            y_theta = y_theta.astype(jnp.float32)
            y_phi = y_phi.astype(jnp.float32)
            if detach_flag:
                y_theta = jax.lax.stop_gradient(y_theta)
                y_phi = jax.lax.stop_gradient(y_phi)
            from cocosnet_tpu.ops.corr_sp import attend_sp

            def row_attend(v):
                return attend_sp(y_theta, y_phi, v, temperature,
                                 match_kernel=1, pono_c=True,
                                 use_pallas=opt.use_pallas,
                                 model=opt.mesh_model)

            def col_attend(v):
                return attend_sp(y_phi, y_theta, v, temperature,
                                 match_kernel=1, pono_c=True,
                                 use_pallas=opt.use_pallas,
                                 model=opt.mesh_model)
        else:
            if opt.mesh_model > 1:
                # mk=1 SP needs PONO_C (the box-statistics centering above);
                # plain spatial-mean centering couples every query row to all
                # others, which the halo machinery doesn't reconstruct
                warnings.warn(
                    "--mesh_model > 1 with match_kernel=1 requires --PONO_C "
                    "for the spatial-parallel correlation; falling back to "
                    "the dense-descriptor path REPLICATED over the model "
                    "axis. Results are correct but unsharded — add --PONO_C "
                    "(the flagship config) to shard this op.", stacklevel=2)
            theta = self._descriptor(cont_features, "theta")   # (B, N, C')
            phi = self._descriptor(ref_features, "phi")        # (B, N, C')
            if detach_flag:
                theta = jax.lax.stop_gradient(theta)
                phi = jax.lax.stop_gradient(phi)
            # fused single-position kernel (ops/pallas_corr.py): VMEM-resident
            # keys cap the descriptor dim at 1024; inference-only by default
            # — its streaming backward's 128-row matmuls underutilize the
            # MXU vs XLA's batched backward (round-1 measurement;
            # COCOSNET_PALLAS_MK1_TRAIN=1 re-enables for re-measurement)
            import os as _os
            use_pallas = (opt.use_pallas
                          and (not train or _os.environ.get(
                              "COCOSNET_PALLAS_MK1_TRAIN") == "1")
                          and jax.default_backend() == "tpu"
                          and theta.shape[-1] % 128 == 0
                          and theta.shape[-1] <= 1024)

            def row_attend(v):
                return attend(theta, phi, v, temperature, use_pallas)

            def col_attend(v):
                return attend(phi, theta, v, temperature, use_pallas)

        # 6. warp the exemplar colors (correspondence.py:310-327)
        if opt.warp_patch:
            ref_v = I.space_to_patches(ref_img, opt.down)      # (B,N,3*d*d)
        else:
            ref_flat = I.avg_pool(ref_img, opt.down)
            ref_v = ref_flat.reshape(b, n, 3)

        need_direct_mask = opt.warp_mask_losstype == "direct" or opt.show_warpmask
        row_values = [ref_v]
        if need_direct_mask:
            ref_seg_v = ref_seg_small.reshape(b, n, -1)
            row_values.append(ref_seg_v)
        row_out = row_attend(jnp.concatenate(row_values, -1)
                             if len(row_values) > 1 else row_values[0])
        y_flat = row_out[..., : ref_v.shape[-1]]

        if opt.warp_patch:
            y = I.patches_to_space(y_flat, opt.down, ih, iw)
            out["warp_out"] = y
            if (not train) and opt.show_corr:
                out["warp_out_bi"] = y
        else:
            y = y_flat.reshape(b, fh, fw, 3)
            out["warp_out"] = (I.upsample_bilinear(y, opt.down)
                               if opt.warp_bilinear
                               else I.upsample_nearest(y, opt.down))
            if (not train) and opt.show_corr:
                out["warp_out_bi"] = I.upsample_bilinear(y, opt.down)

        # 7. warped mask for the mask loss (correspondence.py:329-348)
        if need_direct_mask:
            wm = row_out[..., ref_v.shape[-1]:]
            out["warp_mask"] = wm.reshape(b, fh, fw, -1)
        elif opt.warp_mask_losstype == "cycle":
            seg_v = seg_small.reshape(b, n, -1)
            warp_mask_to_ref = col_attend(seg_v)
            wm = row_attend(warp_mask_to_ref)
            out["warp_mask"] = wm.reshape(b, fh, fw, -1)

        # 8. cycle warps (correspondence.py:350-372)
        if opt.warp_cycle_w > 0:
            if opt.warp_patch:
                y_patches = I.space_to_patches(y, opt.down)
                wc = col_attend(y_patches)
                out["warp_cycle"] = I.patches_to_space(wc, opt.down, ih, iw)
            else:
                wc = col_attend(y.reshape(b, n, 3))
                out["warp_cycle"] = wc.reshape(b, fh, fw, 3)
                if opt.two_cycle and real_img is not None:
                    real_small = I.avg_pool(real_img, opt.down).reshape(b, n, 3)
                    warp_i2r = col_attend(real_small)
                    out["warp_i2r"] = warp_i2r.reshape(b, fh, fw, 3)
                    warp_i2r2i = row_attend(warp_i2r)
                    out["warp_i2r2i"] = warp_i2r2i.reshape(b, fh, fw, 3)

        return out
