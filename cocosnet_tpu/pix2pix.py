"""Model orchestration: builds the networks, preprocesses batches (one-hot
label scatter, dataset-specific label munging), assembles the generator and
discriminator objectives, and runs inference.

Mirrors models/pix2pix_model.py of the reference, restructured for JAX:
instead of a ModuleDict with mode-dispatched forward (pix2pix_model.py:51-86),
each mode is a pure function over explicit variable pytrees, designed to be
jitted (and pjit-sharded) whole.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cocosnet_tpu.config import Options
from cocosnet_tpu.losses.contextual import contextual_loss
from cocosnet_tpu.losses.gan import (feature_matching_loss, gan_loss,
                                     mse_loss, weighted_l1_loss)
from cocosnet_tpu.models.correspondence import CorrespondenceNet
from cocosnet_tpu.models.discriminator import MultiscaleDiscriminator
from cocosnet_tpu.models.generator import (DomainClassifier, SPADEGenerator,
                                           cbn_channels)
from cocosnet_tpu.nn.vgg import VGG19Features
from cocosnet_tpu.ops import image as I

Array = jax.Array
Vars = Dict[str, Any]

VGG_KEYS = ["r12", "r22", "r32", "r42", "r52"]
FM_WEIGHTS = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]


class Pix2PixNets:
    """Holds the flax module objects (no parameters)."""

    def __init__(self, opt: Options):
        self.opt = opt
        self.gen = SPADEGenerator(opt)
        self.corr = CorrespondenceNet(opt)
        self.disc = MultiscaleDiscriminator(opt) if opt.isTrain else None
        self.vgg = (VGG19Features(vgg_normal_correct=opt.vgg_normal_correct)
                    if opt.isTrain else None)
        self.domain_classifier = (
            DomainClassifier(opt)
            if opt.weight_domainC > 0 and opt.domain_rela else None)
        self.perceptual_layer = -1 if opt.which_perceptual == "5_2" else -2

    # ---------------------------------------------------------------- init

    def init_all(self, rng: jax.Array, batch: Dict[str, Array]) -> Dict[str, Vars]:
        """Initialize every network's variables. Shapes are derived statically
        (no eager forward passes) and each init is jitted so this is fast even
        when dispatching over a remote TPU."""
        opt = self.opt
        kg, kc, kd, kv, kdc, knoise = jax.random.split(rng, 6)
        b = batch["image"].shape[0]
        h = opt.crop_size
        w = opt.crop_size
        sem = jnp.zeros((b, h, w, opt.semantic_nc), jnp.float32)
        img = jnp.zeros((b, h, w, 3), jnp.float32)
        nets: Dict[str, Vars] = {}

        def jinit(fn):
            return jax.jit(fn)

        nets["corr"] = jinit(lambda k, kn, r, re, s, rs: self.corr.init(
            {"params": k, "noise": kn}, r, re, s, rs, train=opt.isTrain))(
            kc, knoise, img, img if opt.isTrain else None, sem, sem)
        cbn = jnp.zeros((b, h, w, cbn_channels(opt)), jnp.float32)
        nets["gen"] = jinit(lambda k, s, c: self.gen.init(
            {"params": k}, s, c, train=opt.isTrain))(kg, sem, cbn)
        if self.disc is not None:
            d_in = jnp.zeros((2 * b, h, w, opt.semantic_nc + 3), jnp.float32)
            nets["disc"] = jinit(lambda k, x: self.disc.init(
                {"params": k}, x, train=opt.isTrain))(kd, d_in)
        if self.vgg is not None:
            nets["vgg"] = jinit(lambda k, x: self.vgg.init(
                {"params": k}, x, VGG_KEYS))(kv, img)
        if self.domain_classifier is not None:
            feat = jnp.zeros((b, h // 4, w // 4, 4 * opt.ngf), jnp.float32)
            nets["domain_classifier"] = jinit(
                lambda k, x: self.domain_classifier.init(
                    {"params": k}, x, train=opt.isTrain))(kdc, feat)
        for name, v in nets.items():
            # parity with BaseNetwork.print_network (base_network.py:18-26)
            n = sum(int(np.prod(x.shape))
                    for x in jax.tree.leaves(v.get("params", {})))
            print(f"Network [{name}] was created. Total number of parameters:"
                  f" {n / 1e6:.1f} million.")
        return nets


def cbn_input(opt: Options, warp_out: Array, input_semantics: Array) -> Array:
    """SPADE conditioning per --CBN_intype (pix2pix_model.py:313-318)."""
    if opt.CBN_intype == "mask":
        return input_semantics
    if opt.CBN_intype == "warp":
        return warp_out
    return jnp.concatenate([warp_out, input_semantics], axis=-1)


# ------------------------------------------------------------- preprocessing

def _policy_dtype(opt: Options):
    """The active low-precision activation dtype, or None. Requires BOTH the
    global policy (set by the CLIs via layers.set_compute_dtype) and
    opt.compute_dtype to agree — so a process that mixes configs (tests,
    serving multiple models) honors each opt."""
    from cocosnet_tpu.nn.layers import get_compute_dtype
    dt = get_compute_dtype()
    return dt if (dt is not None and opt.compute_dtype == "bf16") else None


def preprocess_input(opt: Options, data: Dict[str, Array]) -> Dict[str, Array]:
    """One-hot scatter + dataset-specific label handling
    (pix2pix_model.py:144-194). NHWC; runs on device under jit.

    Input dict (from the host loader): label (B,H,W,Cl) float32 raw values,
    image / ref (B,H,W,3) in [-1,1], label_ref like label, self_ref (B,).
    """
    label = data["label"]
    label_ref = data["label_ref"]
    mode = opt.dataset_mode

    if mode == "celebahq":
        # mask channels interleaved with the glasses channel
        # (celebahq_dataset.py:67-84, pix2pix_model.py:145-152)
        glasses = label[..., 1::2]
        label = label[..., ::2]
        glasses_ref = label_ref[..., 1::2]
        label_ref = label_ref[..., ::2]

    if mode in ("celebahqedge", "deepfashion"):
        input_semantics = label.astype(jnp.float32)
        ref_semantics = label_ref.astype(jnp.float32)
        input_label = (label[..., :1] if mode == "celebahqedge"
                       else label[..., :3])
        ref_label = (label_ref[..., :1] if mode == "celebahqedge"
                     else label_ref[..., :3])
    else:
        nc = opt.label_nc + (1 if opt.contain_dontcare_label else 0)
        input_label = label[..., 0].astype(jnp.int32)
        ref_label = label_ref[..., 0].astype(jnp.int32)
        input_semantics = I.one_hot_scatter(input_label, nc)
        ref_semantics = I.one_hot_scatter(ref_label, nc)
        if mode == "celebahq":
            # glasses channel injected at one-hot slot -3
            # (pix2pix_model.py:189-193)
            input_semantics = input_semantics.at[..., -3:-2].set(glasses)
            ref_semantics = ref_semantics.at[..., -3:-2].set(glasses_ref)

    cdt = _policy_dtype(opt)
    if cdt is not None:
        # the (B,H,W,semantic_nc) one-hot maps are the largest live tensors
        # of a train step (~0.3 GB each at batch 8/256px in f32); 0/1 values
        # are exact in bf16 and every consumer casts to the compute dtype
        # anyway, so carry them in bf16 end-to-end
        input_semantics = input_semantics.astype(cdt)
        ref_semantics = ref_semantics.astype(cdt)

    return dict(
        input_label=input_label,
        input_semantics=input_semantics,
        real_image=data["image"],
        self_ref=data["self_ref"],
        ref_image=data["ref"],
        ref_label=ref_label,
        ref_semantics=ref_semantics,
    )


# ----------------------------------------------------------------- forward

def generate_fake(nets: Pix2PixNets, variables: Dict[str, Vars],
                  data: Dict[str, Array], train: bool,
                  rngs: Optional[Dict[str, Array]] = None,
                  mutable=False) -> Tuple[Dict[str, Array], Dict[str, Vars]]:
    """pix2pix_model.py:303-323 (minus the VGG features, handled by caller)."""
    opt = nets.opt
    updates: Dict[str, Vars] = {}
    kwargs = dict(train=train)
    corr_kwargs = dict(kwargs)
    if (not train and opt.dataset_mode in ("ade20k", "flickr")
            and "input_label" in data):
        # inference: input_semantics IS one_hot(input_label) exactly for
        # these datasets (preprocess_input above — no glasses injection, no
        # edge/pose channels), so hand the correspondence net the integer
        # map and let the seg adaptor's first conv stream it instead of the
        # dense one-hot (nn.layers.OneHotLabels -> Pallas gather-conv).
        # Training keeps the dense path: the gather-conv has no VJP and
        # densifying here would just duplicate the one-hot XLA already has.
        corr_kwargs["seg_label"] = data["input_label"]
    corr_mutable = ["spectral", "batch_stats"] if train and mutable else False
    corr_res = nets.corr.apply(
        variables["corr"], data["ref_image"],
        data["real_image"] if train else None,
        data["input_semantics"], data["ref_semantics"],
        rngs=rngs, mutable=corr_mutable, **corr_kwargs)
    if corr_mutable:
        corr_out, updates["corr"] = corr_res
    else:
        corr_out = corr_res

    cbn = cbn_input(opt, corr_out["warp_out"], data["input_semantics"])
    gen_mutable = ["spectral", "batch_stats"] if train and mutable else False
    gen_res = nets.gen.apply(variables["gen"], data["input_semantics"], cbn,
                             mutable=gen_mutable, **kwargs)
    if gen_mutable:
        fake_image, updates["gen"] = gen_res
    else:
        fake_image = gen_res
    out = dict(corr_out)
    out["fake_image"] = fake_image
    return out, updates


def discriminate(nets: Pix2PixNets, disc_vars: Vars, input_semantics: Array,
                 fake_image: Array, real_image: Array, train: bool,
                 mutable=False):
    """Fake and real stacked in ONE batch so any batch-norm statistics are
    shared (pix2pix_model.py:342-353)."""
    cdt = _policy_dtype(nets.opt)
    if cdt is not None:
        # keep the (2B,H,W,semantic_nc+3) stack in the compute dtype: D's
        # first conv casts there anyway and the concat is a top HBM resident
        fake_image = fake_image.astype(cdt)
        real_image = real_image.astype(cdt)
        input_semantics = input_semantics.astype(cdt)
    fake_concat = jnp.concatenate([input_semantics, fake_image], axis=-1)
    real_concat = jnp.concatenate([input_semantics, real_image], axis=-1)
    fake_and_real = jnp.concatenate([fake_concat, real_concat], axis=0)
    disc_mutable = ["spectral", "batch_stats"] if train and mutable else False
    res = nets.disc.apply(disc_vars, fake_and_real, train=train,
                          mutable=disc_mutable)
    updates = None
    if disc_mutable:
        (outs, cam_logits), updates = res
    else:
        outs, cam_logits = res
    pred_fake = [[t[: t.shape[0] // 2] for t in scale] for scale in outs]
    pred_real = [[t[t.shape[0] // 2:] for t in scale] for scale in outs]
    return pred_fake, pred_real, cam_logits, updates


def vgg_features(nets: Pix2PixNets, vgg_vars: Vars, img: Array):
    return nets.vgg.apply(vgg_vars, img, VGG_KEYS)


# ------------------------------------------------------------------- losses

def get_ctx_loss(opt: Options, source, target):
    """pix2pix_model.py:196-203: contextual loss at r5_2 (x8), r4_2 (x4),
    r3_2 avg-pooled (x2), optional r2_2 avg-pooled (x1)."""
    sg = jax.lax.stop_gradient
    loss = jnp.mean(contextual_loss(source[-1], sg(target[-1]),
                                    pono=opt.PONO)) * 8
    loss += jnp.mean(contextual_loss(source[-2], sg(target[-2]),
                                     pono=opt.PONO)) * 4
    loss += jnp.mean(contextual_loss(I.avg_pool(source[-3], 2),
                                     sg(I.avg_pool(target[-3], 2)),
                                     pono=opt.PONO)) * 2
    if opt.use_22ctx:
        loss += jnp.mean(contextual_loss(I.avg_pool(source[-4], 4),
                                         sg(I.avg_pool(target[-4], 4)),
                                         pono=opt.PONO)) * 1
    return loss


def warp_mask_loss(opt: Options, warp_mask: Array, input_label: Array,
                   ref_label: Array) -> Array:
    """NLL of log(warp_mask) against the 4x-downsampled gt label, zeroing
    classes absent from the exemplar and class 0 (pix2pix_model.py:261-276).

    The reference's per-sample torch.unique scan becomes a vectorized
    class-presence reduction (XLA-friendly, no dynamic shapes).
    """
    nc = warp_mask.shape[-1]
    fh, fw = warp_mask.shape[1], warp_mask.shape[2]
    gt = I.resize_nearest(input_label[..., None].astype(jnp.float32),
                          fh, fw)[..., 0].astype(jnp.int32)
    ref = I.resize_nearest(ref_label[..., None].astype(jnp.float32),
                           fh, fw)[..., 0].astype(jnp.int32)
    # presence[b, c] = 1 if class c appears in the (downsampled) ref labels
    presence = jnp.max(I.one_hot_scatter(ref, nc), axis=(1, 2))  # (B, nc)
    w = jnp.take_along_axis(presence, gt.reshape(gt.shape[0], -1),
                            axis=1).reshape(gt.shape)
    w = jnp.where(gt == 0, 0.0, w)  # no loss from the unknown class
    logp = jnp.log(warp_mask + 1e-10)
    nll = -jnp.take_along_axis(
        logp.reshape(gt.shape[0], -1, nc),
        gt.reshape(gt.shape[0], -1, 1), axis=2)[..., 0].reshape(gt.shape)
    return jnp.sum(nll * w) / (jnp.sum(w) + 1e-5) * opt.weight_mask


def compute_generator_losses(nets: Pix2PixNets, variables: Dict[str, Vars],
                             data: Dict[str, Array], generate_out,
                             disc_vars: Vars, mutable_disc: bool = False):
    """pix2pix_model.py:205-279 — all 11 loss terms.

    mutable_disc=True additionally returns the discriminator's state updates
    from its forward here (-> (losses, d_updates)): torch's spectral-norm
    pre-hook advances D's power iteration on EVERY forward, including this
    G-step discriminate (pix2pix_model.py:230-231), so the train step merges
    these updates to reproduce the reference's u/v trajectory exactly."""
    opt = nets.opt
    sg = jax.lax.stop_gradient
    losses: Dict[str, Array] = {}

    if "loss_novgg_featpair" in generate_out:
        losses["no_vgg_feat"] = generate_out["loss_novgg_featpair"]

    real_image = data["real_image"]
    ref_image = data["ref_image"]
    self_ref = data["self_ref"]  # (B,)

    if opt.warp_cycle_w > 0:
        ref = ref_image if opt.warp_patch else I.avg_pool(ref_image,
                                                          opt.warp_stride)
        losses["G_warp_cycle"] = jnp.mean(
            jnp.abs(generate_out["warp_cycle"] - ref)) * opt.warp_cycle_w
        if opt.two_cycle:
            real = I.avg_pool(real_image, opt.warp_stride)
            losses["G_warp_cycle"] += jnp.mean(
                jnp.abs(generate_out["warp_i2r2i"] - real)) * opt.warp_cycle_w

    sample_weights = (self_ref / (jnp.sum(self_ref) + 1e-5))[:, None, None, None]

    if opt.warp_self_w > 0:
        losses["G_warp_self"] = jnp.mean(
            jnp.abs(generate_out["warp_out"] - real_image) * sample_weights
        ) * opt.warp_self_w

    pred_fake, pred_real, cam_logits, disc_updates = discriminate(
        nets, disc_vars, data["input_semantics"], generate_out["fake_image"],
        real_image, train=True, mutable=mutable_disc)

    losses["GAN"] = gan_loss(pred_fake, True, for_discriminator=False,
                             gan_mode=opt.gan_mode) * opt.weight_gan

    if not opt.no_ganFeat_loss:
        losses["GAN_Feat"] = (feature_matching_loss(pred_fake, pred_real)
                              * opt.lambda_feat)

    fake_vgg = (lambda img: vgg_features(nets, variables["vgg"], img))
    if opt.remat:
        # the 16-conv VGG tower at 256px saves ~0.6GB of activations per
        # sample for its backward; recompute them instead
        fake_vgg = jax.checkpoint(fake_vgg)
    fake_features = fake_vgg(generate_out["fake_image"])
    real_features = generate_out["real_features"]
    ref_features = generate_out["ref_features"]

    fm = 0.0
    for w, ff, rf in zip(FM_WEIGHTS, fake_features, real_features):
        fm += w * weighted_l1_loss(ff, sg(rf), sample_weights)
    losses["fm"] = fm * opt.lambda_vgg * opt.fm_ratio

    pl = nets.perceptual_layer
    losses["perc"] = mse_loss(fake_features[pl],
                              sg(real_features[pl])) * opt.weight_perceptual

    losses["contextual"] = (get_ctx_loss(opt, fake_features, ref_features)
                            * opt.lambda_vgg * opt.ctx_w)

    if opt.warp_mask_losstype != "none":
        input_label = data["input_label"]
        ref_label = data["ref_label"]
        if input_label.ndim == 4:  # edge/pose labels don't use the mask loss
            input_label = input_label[..., 0].astype(jnp.int32)
            ref_label = ref_label[..., 0].astype(jnp.int32)
        losses["mask"] = warp_mask_loss(opt, generate_out["warp_mask"],
                                        input_label, ref_label)
    if mutable_disc:
        return losses, disc_updates
    return losses


def compute_discriminator_losses(nets: Pix2PixNets, disc_vars: Vars,
                                 data: Dict[str, Array],
                                 fake_image: Array) -> Dict[str, Array]:
    """pix2pix_model.py:281-296 — hinge on detached fake + real."""
    opt = nets.opt
    fake_image = jax.lax.stop_gradient(fake_image)
    pred_fake, pred_real, cam_logits, _ = discriminate(
        nets, disc_vars, data["input_semantics"], fake_image,
        data["real_image"], train=True, mutable=False)
    return {
        "D_Fake": gan_loss(pred_fake, False, for_discriminator=True,
                           gan_mode=opt.gan_mode) * opt.weight_gan,
        "D_real": gan_loss(pred_real, True, for_discriminator=True,
                           gan_mode=opt.gan_mode) * opt.weight_gan,
    }


def inference(nets: Pix2PixNets, variables: Dict[str, Vars],
              data: Dict[str, Array],
              rng: Optional[Array] = None) -> Dict[str, Array]:
    """pix2pix_model.py:325-337. `rng` feeds the eval-time noise draws
    (--noise_for_mask past mask_epoch, correspondence.py:262-264); omitted,
    those draws fall back to a fixed key (deterministic eval)."""
    rngs = {"noise": rng} if rng is not None else None
    out, _ = generate_fake(nets, variables, data, train=False, rngs=rngs)
    return out
