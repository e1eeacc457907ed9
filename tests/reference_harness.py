"""Test-only harness that imports the reference PyTorch implementation from
/root/reference (read-only) to generate oracle outputs and state dicts.

The reference expects a cloned Synchronized-BatchNorm-PyTorch package
(reference README.md:28-34) and CUDA; we shim the sync_batchnorm import with
plain torch BatchNorm (single-process statistics are identical) and run on
CPU. This is strictly a numerical oracle for parity tests — no reference
code is vendored into the framework.
"""

from __future__ import annotations

import argparse
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_sync_batchnorm_shim():
    import torch.nn as nn
    shim = types.ModuleType("models.networks.sync_batchnorm")
    shim.SynchronizedBatchNorm2d = nn.BatchNorm2d
    shim.SynchronizedBatchNorm1d = nn.BatchNorm1d

    def DataParallelWithCallback(module, device_ids=None):
        return module

    shim.DataParallelWithCallback = DataParallelWithCallback
    sys.modules["models.networks.sync_batchnorm"] = shim

    if "torchvision" not in sys.modules:
        # only referenced for the unused pretrained-VGG19 class
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision not available in test env")

        tv_models.vgg19 = _unavailable
        tv.models = tv_models

        class _Lambda:
            def __init__(self, fn):
                self.fn = fn

            def __call__(self, x):
                return self.fn(x)

        class _Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        tv_transforms = types.ModuleType("torchvision.transforms")
        tv_transforms.Lambda = _Lambda
        tv_transforms.Compose = _Compose
        class _Normalize:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tv_transforms.Normalize = _Normalize
        tv_transforms.ToPILImage = _Normalize
        tv_transforms.ToTensor = _Normalize
        tv_transforms.Resize = _Normalize
        tv.transforms = tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.transforms"] = tv_transforms


_loaded = False


def load_reference():
    """Make the reference package importable; returns its module namespace."""
    global _loaded
    if not _loaded:
        sys.path.insert(0, REFERENCE_ROOT)
        _install_sync_batchnorm_shim()
        _loaded = True
    # util/util.py loads ./util/color150.mat relative to the repo root at
    # import time — import from inside the reference checkout
    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE_ROOT)
        import models.networks as networks  # noqa: F401  (reference package)
    finally:
        os.chdir(cwd)
    return networks


def reference_opt(**overrides) -> argparse.Namespace:
    """An opt namespace with the reference defaults needed by the networks
    (options/base_options.py:22-93 + train_options.py), CPU, small sizes."""
    d = dict(
        norm_G="spectralspadesyncbatch3x3", norm_D="spectralinstance",
        norm_E="spectralinstance", batchSize=2, crop_size=64, aspect_ratio=1.0,
        label_nc=12, contain_dontcare_label=True, semantic_nc=13, output_nc=3,
        dataset_mode="ade20k", netG="spade", ngf=16, init_type="xavier",
        init_variance=0.02, z_dim=256, CBN_intype="warp_mask", maskmix=True,
        use_attention=True, warp_mask_losstype="direct", show_warpmask=False,
        match_kernel=1, adaptor_kernel=3, PONO=True, PONO_C=True,
        eqlr_sn=False, vgg_normal_correct=True, weight_domainC=0.0,
        domain_rela=False, use_ema=False, ema_beta=0.999, warp_cycle_w=0.0,
        two_cycle=False, apex=False, warp_bilinear=False,
        adaptor_res_deeper=False, adaptor_nonlocal=False, adaptor_se=False,
        dilation_conv=False, use_coordconv=False, warp_patch=False,
        warp_stride=4, mask_noise=False, noise_for_mask=False,
        video_like=False, netD="multiscale", netD_subarch="n_layer",
        num_D=2, n_layers_D=4, ndf=16, no_ganFeat_loss=False,
        gan_mode="hinge", no_TTUR=False, isTrain=False, phase="test",
        mask_epoch=-1, epoch=1, novgg_featpair=10.0, D_cam=0.0,
        use_22ctx=False, warp_self_w=0.0, gpu_ids=[], show_corr=False,
    )
    d.update(overrides)
    ns = argparse.Namespace(**d)
    return ns


class OptNS(argparse.Namespace):
    """Namespace supporting `'x' in opt` like the reference uses
    (architecture.py:55, correspondence.py:162)."""

    def __contains__(self, key):
        return key in self.__dict__


def make_opt(**overrides):
    ns = reference_opt(**overrides)
    return OptNS(**vars(ns))
