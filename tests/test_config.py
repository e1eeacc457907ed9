"""Config/CLI parity: the published reference command lines must parse to
the right configurations (reference README.md:45-115)."""
import sys

from cocosnet_tpu.config import parse_options


def test_ade20k_inference_flags():
    opt = parse_options(
        ("--name ade20k --dataset_mode ade20k --dataroot ./imgs/ade20k "
         "--gpu_ids 0 --nThreads 0 --batchSize 6 --use_attention --maskmix "
         "--warp_mask_losstype direct --PONO --PONO_C").split(),
        is_train=False)
    assert opt.label_nc == 150 and opt.contain_dontcare_label
    assert opt.semantic_nc == 151
    assert opt.load_size == 256 and opt.crop_size == 256
    assert opt.serial_batches and opt.no_flip  # test-phase forcing
    assert opt.use_attention and opt.maskmix and opt.PONO and opt.PONO_C
    assert opt.warp_mask_losstype == "direct"
    assert not opt.isTrain and opt.phase == "test"
    assert opt.down == 4 and opt.feature_hw == 64 and opt.corr_n == 4096


def test_deepfashion_inference_flags():
    opt = parse_options(
        ("--name deepfashion --dataset_mode deepfashion "
         "--dataroot ./imgs/DeepFashion --batchSize 4 --use_attention "
         "--PONO --PONO_C --warp_bilinear --no_flip --warp_patch "
         "--video_like --adaptor_kernel 4").split(),
        is_train=False)
    assert opt.label_nc == 20 and not opt.contain_dontcare_label
    assert opt.warp_patch and opt.video_like and opt.warp_bilinear
    assert opt.adaptor_kernel == 4


def test_ade20k_train_flags():
    opt = parse_options(
        ("--name ade20k --dataset_mode ade20k --dataroot d --niter 100 "
         "--niter_decay 100 --use_attention --maskmix "
         "--warp_mask_losstype direct --weight_mask 100.0 --PONO --PONO_C "
         "--batchSize 32 --vgg_normal_correct").split(),
        is_train=True)
    assert opt.isTrain and opt.phase == "train"
    assert opt.load_size == 286  # train-time default
    assert opt.weight_mask == 100.0 and opt.vgg_normal_correct
    assert opt.niter == 100 and opt.niter_decay == 100
    # TTUR defaults (pix2pix_model.py:97-104)
    assert not opt.no_TTUR and opt.lr == 0.0002


def test_celebahq_train_defaults_override():
    opt = parse_options(
        ("--dataset_mode celebahq --dataroot d --which_perceptual 4_2 "
         "--weight_perceptual 0.001 --fm_ratio 1.0 --warp_bilinear "
         "--warp_cycle_w 0.1").split(),
        is_train=True)
    assert opt.label_nc == 19 and opt.semantic_nc == 19
    assert opt.no_pairing_check  # dataset default
    assert opt.which_perceptual == "4_2" and opt.fm_ratio == 1.0
    assert opt.warp_cycle_w == 0.1


def test_explicit_flag_beats_dataset_default():
    opt = parse_options(
        "--dataset_mode ade20k --dataroot d --label_nc 99".split(),
        is_train=True)
    assert opt.label_nc == 99


def test_warp_stride_2_sets_down():
    opt = parse_options(
        "--dataset_mode ade20k --dataroot d --warp_stride 2".split(),
        is_train=True)
    assert opt.down == 2


def test_options_roundtrip(tmp_path):
    from cocosnet_tpu.config import load_options, save_options
    opt = parse_options(
        "--dataset_mode celebahqedge --dataroot d --warp_bilinear".split(),
        is_train=False)
    p = str(tmp_path / "opt.json")
    save_options(opt, p)
    opt2 = load_options(p)
    assert opt2 == opt
