#!/usr/bin/env python
"""Training-dynamics parity: N optimization steps of OUR fused train step vs
the reference Pix2PixTrainer (torch, CPU), from IDENTICAL weights (via the
.pth converter) on IDENTICAL data.

This validates what single-step parity cannot: the TTUR Adam updates
(G lr/2 eps 1e-3, D lr*2, betas (0,0.9) — pix2pix_model.py:88-107), the
hinge-GAN G<->D interaction, train-mode sync-BN statistics, and EMA shadow
tracking, compounded over many steps.

Run via pytest (tests/test_trajectory_parity.py, short) or standalone:
  python tools/parity_trajectory.py --steps 50 --out parity_curves.json

Runs with the reference's default spectral norms: our train step reproduces
torch's pre-hook semantics exactly (D's power iteration advances in the
G-step discriminate AND the D step — train/steps.py mutable_disc), so the
u/v trajectories match too.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


class _CpuIds(list):
    """gpu_ids shim: len()==0 so use_gpu() is False and .cuda() is never
    called, but [0] still resolves (pix2pix_model.py:35 does
    `.to(opt.gpu_ids[0])` unconditionally)."""

    def __len__(self):
        return 0

    def __getitem__(self, i):
        import torch
        return torch.device("cpu")

    def __bool__(self):
        return False


def _make_batches(n_steps: int, b: int, size: int, label_nc: int, seed=123):
    """Identical per-step batches for both frameworks (numpy, NHWC)."""
    rs = np.random.RandomState(seed)
    batches = []
    for _ in range(n_steps):
        lab = rs.randint(0, label_nc + 1, (b, size, size, 1)).astype(np.float32)
        img = (rs.rand(b, size, size, 3).astype(np.float32) * 2 - 1)
        # exemplar = shifted real so the correlation has signal
        ref = np.roll(img, 5, axis=1) * 0.9 + 0.1 * rs.rand(
            b, size, size, 3).astype(np.float32)
        lab_ref = np.roll(lab, 5, axis=1)
        batches.append({
            "label": lab, "image": img, "ref": ref, "label_ref": lab_ref,
            "self_ref": np.ones((b,), np.float32),
        })
    return batches


_TRAIN_OVERRIDES = dict(
    isTrain=True, phase="train",
    norm_G="spectralspadesyncbatch3x3", norm_D="spectralinstance",
    norm_E="spectralinstance",
    label_nc=12, contain_dontcare_label=True, semantic_nc=13,
    crop_size=64, batchSize=2, ngf=64, ndf=16, num_D=2, n_layers_D=4,
    use_attention=True, maskmix=True, warp_mask_losstype="direct",
    weight_mask=100.0, match_kernel=1, PONO=True, PONO_C=True,
    vgg_normal_correct=True, use_ema=True, ema_beta=0.999,
    lr=1e-4, beta1=0.5, beta2=0.999, no_TTUR=False,
    lambda_feat=10.0, lambda_vgg=10.0, no_ganFeat_loss=False,
    gan_mode="hinge", which_perceptual="5_2", weight_perceptual=0.01,
    weight_gan=10.0, novgg_featpair=10.0, fm_ratio=0.1, ctx_w=1.0,
    use_22ctx=False, warp_self_w=0.0, warp_cycle_w=0.0,
    D_steps_per_G=1, continue_train=False, mask_epoch=-1,
)


def run_torch(batches, vgg_sd):
    """Reference Pix2PixTrainer for len(batches) iterations; returns
    (loss curves {name: [v...]}, trained state dicts, ema shadows)."""
    import torch
    from tests import reference_harness as RH
    RH.load_reference()

    topt = RH.make_opt(**_TRAIN_OVERRIDES)
    topt.gpu_ids = _CpuIds()
    topt.checkpoints_dir = "/tmp/ref_parity_ckpt"
    topt.name = "parity"
    topt.which_epoch = "latest"

    real_load = torch.load

    def fake_load(path, *a, **k):
        if isinstance(path, str) and path.endswith("vgg19_conv.pth"):
            return vgg_sd
        return real_load(path, *a, **k)

    real_adam = torch.optim.Adam

    class _Adam(real_adam):
        # the reference passes betas=(0, 0.9) with an int 0
        # (pix2pix_model.py:102), which torch >= 2.5 rejects
        def __init__(self, params, *a, betas=(0.9, 0.999), **k):
            super().__init__(params, *a,
                             betas=tuple(float(b) for b in betas), **k)

    torch.load = fake_load
    torch.optim.Adam = _Adam
    try:
        torch.manual_seed(0)
        cwd = os.getcwd()
        os.chdir(RH.REFERENCE_ROOT)
        try:
            from trainers.pix2pix_trainer import Pix2PixTrainer
            trainer = Pix2PixTrainer(topt)
        finally:
            os.chdir(cwd)
    finally:
        torch.load = real_load
        torch.optim.Adam = real_adam

    model = trainer.pix2pix_model_on_one_gpu
    init_sd = {
        "G": {k: v.numpy().copy() for k, v in
              model.net["netG"].state_dict().items()},
        "Corr": {k: v.numpy().copy() for k, v in
                 model.net["netCorr"].state_dict().items()},
        "D": {k: v.numpy().copy() for k, v in
              model.net["netD"].state_dict().items()},
    }

    def to_torch(batch):
        out = {}
        for k, v in batch.items():
            if k == "self_ref":
                out[k] = torch.from_numpy(
                    v[:, None, None, None].repeat(3, 1).reshape(
                        v.shape[0], 3, 1, 1))
            else:
                t = torch.from_numpy(np.transpose(v, (0, 3, 1, 2)))
                if k in ("label", "label_ref"):
                    # the reference .long()s these only on its .cuda() path
                    # (pix2pix_model.py:166-176); the CPU path needs them
                    # integral already for scatter_
                    t = t.long()
                out[k] = t
        return out

    curves = {}
    for batch in batches:
        data = to_torch(batch)
        trainer.run_generator_one_step(data)
        trainer.run_discriminator_one_step(data)
        for k, v in trainer.get_latest_losses().items():
            curves.setdefault(k, []).append(float(v.mean()))

    ema = {
        "G": {k: v.numpy().copy()
              for k, v in trainer.netG_ema.shadow.items()},
        "Corr": {k: v.numpy().copy()
                 for k, v in trainer.netCorr_ema.shadow.items()},
    } if topt.use_ema else None
    return curves, init_sd, ema


def run_ours(batches, init_sd, vgg_sd):
    """Our fused train step from the converted torch init; returns curves."""
    import jax
    import jax.numpy as jnp

    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.config import test_defaults
    from cocosnet_tpu.train import state as S
    from cocosnet_tpu.train import steps as ST
    from cocosnet_tpu.train.checkpoints import (convert_torch_module,
                                                default_name_map)
    from tools.convert_weights import _disc_name_map, merge_into

    opt = test_defaults(
        dataset_mode="ade20k", load_size=64, use_pallas=False,
        **{k: v for k, v in _TRAIN_OVERRIDES.items()
           if k not in ("phase", "semantic_nc")})
    nets = P.Pix2PixNets(opt)
    b0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
    variables = nets.init_all(jax.random.PRNGKey(0), b0)

    variables["gen"] = merge_into(
        variables["gen"], convert_torch_module(init_sd["G"], default_name_map))
    variables["corr"] = merge_into(
        variables["corr"],
        convert_torch_module(init_sd["Corr"], default_name_map))
    variables["disc"] = merge_into(
        variables["disc"], convert_torch_module(init_sd["D"], _disc_name_map))
    variables["vgg"] = merge_into(
        variables["vgg"], convert_torch_module(
            {k: v.numpy() for k, v in vgg_sd.items()}, default_name_map))

    state = S.create_train_state(opt, variables, jax.random.PRNGKey(1))
    step = jax.jit(ST.make_train_step(nets), donate_argnums=(0,))
    lr = jnp.asarray(S.lrs_for_epoch(opt, 1))

    curves = {}
    for batch in batches:
        state, metrics, _ = step(state, {k: jnp.asarray(v)
                                         for k, v in batch.items()}, lr)
        for k, v in metrics.items():
            curves.setdefault(k, []).append(float(v))
    return curves, state


def make_vgg_sd(seed=7):
    """Seeded random VGG19 state dict standing in for models/vgg19_conv.pth
    (absent here): both sides share it, so perceptual/contextual loss
    dynamics are exercised with REAL (identical) feature extractors."""
    import torch
    from tests import reference_harness as RH
    RH.load_reference()
    from models.networks.correspondence import VGG19_feature_color_torchversion
    torch.manual_seed(seed)
    vgg = VGG19_feature_color_torchversion(vgg_normal_correct=True)
    return vgg.state_dict()


def run_parity(steps: int):
    vgg_sd = make_vgg_sd()
    batches = _make_batches(steps, b=2, size=64,
                            label_nc=_TRAIN_OVERRIDES["label_nc"])
    torch_curves, init_sd, _ = run_torch(batches, vgg_sd)
    our_curves, _ = run_ours(batches, init_sd, vgg_sd)
    return torch_curves, our_curves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default="parity_curves.json")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for our side; cpu = f32 apples-to-"
                         "apples vs the torch-CPU reference (the TPU's bf16 "
                         "matmuls add ~1e-3 noise that compounds)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    torch_curves, our_curves = run_parity(args.steps)
    report = {}
    for k in sorted(torch_curves):
        t = np.asarray(torch_curves[k])
        o = np.asarray(our_curves.get(k, []))
        rel = np.abs(o - t) / (np.abs(t) + 1e-3)
        report[k] = {
            "torch": t.tolist(), "ours": o.tolist(),
            "max_rel": float(rel.max()), "mean_rel": float(rel.mean()),
        }
        print(f"{k:12s} mean_rel={rel.mean():.4f} max_rel={rel.max():.4f} "
              f"final torch={t[-1]:.4f} ours={o[-1]:.4f}")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
