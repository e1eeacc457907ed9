"""Golden-output fidelity harness (SURVEY §4: the reference's committed
output/test/*/0.png grids over the bundled imgs/ mini-datasets are its only
regression artifacts; BASELINE.md sets PSNR >= 40dB as the target).

These tests run full inference on the bundled inputs with *converted released
checkpoints* and compare the fake-image strip against the reference grid.
They skip unless the checkpoints are present (they are not distributed with
this environment); the harness itself is exercised by the random-weights
smoke in test_cli_smoke.
"""
import os

import numpy as np
import pytest
from PIL import Image

CKPT_ROOT = os.environ.get("COCOSNET_CKPT_ROOT", "./checkpoints")
GOLDEN_ROOT = "/root/reference/output/test"
IMGS = "/root/reference/imgs"
TABLES = "/root/reference/data"

CONFIGS = {
    "ade20k": dict(
        args=("--name ade20k --dataset_mode ade20k --batchSize 6 "
              "--use_attention --maskmix --warp_mask_losstype direct "
              "--PONO --PONO_C").split() + ["--dataroot", f"{IMGS}/ade20k"],
        n=6),
    "celebahq": dict(
        args=("--name celebahq --dataset_mode celebahq --batchSize 4 "
              "--use_attention --maskmix --warp_mask_losstype direct --PONO "
              "--PONO_C --warp_bilinear --adaptor_kernel 4").split()
        + ["--dataroot", f"{IMGS}/celebahq"],
        n=4),
    "celebahqedge": dict(
        args=("--name celebahqedge --dataset_mode celebahqedge --batchSize 4 "
              "--use_attention --maskmix --PONO --PONO_C --warp_bilinear "
              "--adaptor_kernel 4").split()
        + ["--dataroot", f"{IMGS}/celebahqedge"],
        n=4),
    "deepfashion": dict(
        args=("--name deepfashion --dataset_mode deepfashion --batchSize 4 "
              "--use_attention --PONO --PONO_C --warp_bilinear --no_flip "
              "--warp_patch --video_like --adaptor_kernel 4").split()
        + ["--dataroot", f"{IMGS}/DeepFashion"],
        n=4),
}


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def _have_ckpt(name: str) -> bool:
    d = os.path.join(CKPT_ROOT, name)
    return (os.path.exists(os.path.join(d, "latest_net_G.pth"))
            or os.path.exists(os.path.join(d, "latest_net_Corr.pth")))


def run_inference_fake_strip(name: str):
    """Run our inference over the bundled set; return the fake-image strip
    as uint8 (H, n*W, 3) matching the golden grid's bottom row."""
    import jax
    from cocosnet_tpu.config import parse_options
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.data.loader import create_dataloader
    from cocosnet_tpu.train.steps import make_inference_step
    import test as test_cli

    cfg = CONFIGS[name]
    opt = parse_options(cfg["args"] + ["--ref_table_dir", TABLES,
                                       "--checkpoints_dir", CKPT_ROOT],
                        is_train=False)
    dl = create_dataloader(opt)
    batch = next(iter(dl))
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    nets = P.Pix2PixNets(opt)
    variables = nets.init_all(jax.random.PRNGKey(0), arrays)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}
    loaded = test_cli.load_any_checkpoint(
        opt, nets, variables, os.path.join(CKPT_ROOT, name))
    assert loaded is not None
    step = make_inference_step(nets)
    fake = np.asarray(step(loaded, arrays)["fake_image"])
    strip = np.concatenate(list((fake + 1) / 2), axis=1)
    return np.clip(strip * 255 + 0.5, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_golden_psnr(name):
    if not os.path.isdir(GOLDEN_ROOT):
        pytest.skip("reference goldens not mounted")
    if not _have_ckpt(name):
        pytest.skip(f"released checkpoints for {name} not present under "
                    f"{CKPT_ROOT} (set COCOSNET_CKPT_ROOT)")
    golden = np.asarray(Image.open(os.path.join(GOLDEN_ROOT, name, "0.png")))
    n = CONFIGS[name]["n"]
    h = golden.shape[0] // 3
    golden_fake = golden[2 * h:, :, :3]  # bottom row of the 3-row grid
    ours = run_inference_fake_strip(name)
    assert ours.shape == golden_fake.shape
    value = psnr(ours, golden_fake)
    print(f"{name}: PSNR {value:.2f} dB")
    assert value >= 40.0, f"{name} PSNR {value:.2f} < 40 dB"
