"""Train-step smoke over the reference's per-dataset training configs
(README.md:83-115) at tiny sizes: exercises warp_cycle, two_cycle, cycle
mask loss, warp_patch, warp_self, EMA, noise paths under jit + grad."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocosnet_tpu.config import test_defaults


def _run_one_step(**flags):
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.train import state as S, steps as ST

    base = dict(dataset_mode="ade20k", label_nc=5, contain_dontcare_label=True,
                crop_size=64, load_size=64, batchSize=2, ngf=8, ndf=8,
                PONO=True, PONO_C=True, vgg_normal_correct=True,
                use_pallas=False, isTrain=True)
    base.update(flags)
    opt = test_defaults(**base)
    nets = P.Pix2PixNets(opt)
    rs = np.random.RandomState(0)
    ch = {"celebahqedge": 15, "deepfashion": 20}.get(opt.dataset_mode, 1)
    if opt.dataset_mode == "celebahq":
        ch = 2
    batch = {
        "label": jnp.asarray(
            rs.randint(0, 2 if ch > 1 else 6,
                       (2, 64, 64, ch)).astype(np.float32)),
        "image": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * .1),
        "ref": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * .1),
        "label_ref": jnp.asarray(
            rs.randint(0, 2 if ch > 1 else 6,
                       (2, 64, 64, ch)).astype(np.float32)),
        "self_ref": jnp.ones((2,), jnp.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(0), batch)
    state = S.create_train_state(opt, variables, jax.random.PRNGKey(1))
    step = jax.jit(ST.make_train_step(nets))
    state, metrics, _ = step(state, batch, jnp.asarray(S.lrs_for_epoch(opt, 1)))
    m = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in m.values()), m
    return m


def test_celebahq_style_training():
    """warp_cycle + direct mask + bilinear warp (README.md:97)."""
    m = _run_one_step(dataset_mode="celebahq", label_nc=19,
                      contain_dontcare_label=False, maskmix=True,
                      use_attention=True, warp_mask_losstype="direct",
                      weight_mask=100.0, warp_bilinear=True,
                      warp_cycle_w=0.1, which_perceptual="4_2",
                      weight_perceptual=0.001, fm_ratio=1.0, adaptor_kernel=4)
    assert "G_warp_cycle" in m and "mask" in m


def test_deepfashion_style_training():
    """warp_patch + warp_self + video_like + no mask loss (README.md:115)."""
    m = _run_one_step(dataset_mode="deepfashion", label_nc=20,
                      contain_dontcare_label=False, use_attention=True,
                      warp_bilinear=True, warp_self_w=100.0, warp_patch=True,
                      video_like=True, real_reference_probability=0.0,
                      which_perceptual="4_2", adaptor_kernel=4)
    assert "G_warp_self" in m and "mask" not in m


def test_cycle_mask_and_two_cycle():
    """cycle warp-mask loss + two_cycle path (correspondence.py:337-372)."""
    m = _run_one_step(maskmix=True, warp_mask_losstype="cycle",
                      weight_mask=10.0, warp_cycle_w=1.0, two_cycle=True)
    assert "mask" in m and "G_warp_cycle" in m


def test_mask_noise_and_noise_for_mask():
    """stochastic mask paths (correspondence.py:239-244, 262-264)."""
    m = _run_one_step(maskmix=True, mask_noise=True, noise_for_mask=True,
                      mask_epoch=0, warp_mask_losstype="direct",
                      weight_mask=10.0)
    assert "mask" in m


def test_remat_training_step():
    """--remat rematerializes the G forward + fake-VGG tower; losses must
    be identical code paths (memory-only change)."""
    m = _run_one_step(maskmix=True, warp_mask_losstype="direct",
                      weight_mask=10.0, remat=True)
    assert "GAN" in m and "mask" in m


def test_remat_policy_conv_matches_block():
    """--remat_policy conv/conv_small only change what the per-block remat
    saves (conv outputs tagged via checkpoint_name) — pure scheduling, so
    every loss term must match the default block policy."""
    kw = dict(maskmix=True, warp_mask_losstype="direct", weight_mask=10.0,
              remat=True)
    ref = _run_one_step(**kw)
    for policy in ("conv", "conv_small"):
        m = _run_one_step(remat_policy=policy, **kw)
        assert set(m) == set(ref)
        for k in ref:
            assert np.isclose(m[k], ref[k], rtol=2e-4, atol=1e-5), \
                (policy, k, m[k], ref[k])


def test_eqlr_coordconv_adaptor_extras():
    """equalized-lr weight norm + coordconv + deeper/dilated/SE/nonlocal
    adaptor + ls GAN (base_options.py:74,84-88)."""
    m = _run_one_step(eqlr_sn=True, use_coordconv=True, adaptor_nonlocal=True,
                      adaptor_se=True, adaptor_res_deeper=True,
                      dilation_conv=True, gan_mode="ls", maskmix=True)
    assert np.isfinite(m["GAN"])


def test_dcam_nottur_original_gan():
    """CAM discriminator logits + no_TTUR adam + original GAN + no D feature
    matching (train_options.py:36,45; discriminator.py:117-126)."""
    m = _run_one_step(D_cam=1.0, no_TTUR=True, gan_mode="original",
                      no_ganFeat_loss=True)
    assert "GAN_Feat" not in m and np.isfinite(m["GAN"])
