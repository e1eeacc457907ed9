"""Full-size end-to-end fidelity rehearsal with synthetic released-format
checkpoints, for every headline config (reference README.md:45-71):
random-initialized reference torch nets are saved exactly like released
.pth files, imported through test.py's checkpoint path, and the complete
256px inference is compared against the torch forward on identical
preprocessed tensors.

Round-1 measurement (ade20k, 2304-dim unfold descriptors): PSNR 106.8 dB
(real-weights target: >= 40 dB, BASELINE.md). Covers everything the golden
gate needs except the released weights themselves.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

IMGS = "/root/reference/imgs"
TABLES = "/root/reference/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(IMGS),
                                reason="reference imgs not mounted")

# (cli args, torch-opt overrides) per headline config
CONFIGS = {
    "ade20k": (
        ["--dataset_mode", "ade20k", "--dataroot", f"{IMGS}/ade20k",
         "--use_attention", "--maskmix", "--warp_mask_losstype", "direct",
         "--PONO", "--PONO_C"],
        dict(label_nc=150, semantic_nc=151, maskmix=True,
             warp_mask_losstype="direct"),
    ),
    "celebahq": (
        ["--dataset_mode", "celebahq", "--dataroot", f"{IMGS}/celebahq",
         "--use_attention", "--maskmix", "--warp_mask_losstype", "direct",
         "--PONO", "--PONO_C", "--warp_bilinear", "--adaptor_kernel", "4"],
        dict(label_nc=19, semantic_nc=19, maskmix=True,
             warp_mask_losstype="direct", warp_bilinear=True,
             adaptor_kernel=4),
    ),
    "celebahqedge": (
        ["--dataset_mode", "celebahqedge",
         "--dataroot", f"{IMGS}/celebahqedge", "--use_attention",
         "--maskmix", "--PONO", "--PONO_C", "--warp_bilinear",
         "--adaptor_kernel", "4"],
        dict(label_nc=15, semantic_nc=15, maskmix=True,
             warp_mask_losstype="none", warp_bilinear=True,
             adaptor_kernel=4),
    ),
    "deepfashion": (
        ["--dataset_mode", "deepfashion",
         "--dataroot", f"{IMGS}/DeepFashion", "--use_attention", "--PONO",
         "--PONO_C", "--warp_bilinear", "--no_flip", "--warp_patch",
         "--video_like", "--adaptor_kernel", "4"],
        dict(label_nc=20, semantic_nc=20, maskmix=False,
             warp_mask_losstype="none", warp_bilinear=True, warp_patch=True,
             video_like=True, adaptor_kernel=4),
    ),
}


def _nchw(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))


@pytest.mark.parametrize("name", list(CONFIGS))
def test_synthetic_checkpoint_roundtrip_full_size(name, tmp_path):
    import reference_harness as RH
    RH.load_reference()
    from models.networks.correspondence import NoVGGCorrespondence
    from models.networks.generator import SPADEGenerator as TorchG

    cli_args, topt_over = CONFIGS[name]
    topt = RH.make_opt(ngf=64, ndf=64, crop_size=256, match_kernel=3,
                       use_attention=True, PONO=True, PONO_C=True,
                       **topt_over)
    torch.manual_seed(7)
    tc = NoVGGCorrespondence(topt)
    tc.init_weights("xavier", 0.02)
    tc.eval()
    tg = TorchG(topt)
    tg.init_weights("xavier", 0.02)
    tg.eval()
    ckpt = tmp_path / name
    ckpt.mkdir()
    torch.save(tc.state_dict(), ckpt / "latest_net_Corr.pth")
    torch.save(tg.state_dict(), ckpt / "latest_net_G.pth")

    from cocosnet_tpu.config import parse_options
    from cocosnet_tpu.data.loader import create_dataloader
    from cocosnet_tpu import pix2pix as P
    spec = importlib.util.spec_from_file_location(
        "our_test_cli",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "test.py"))
    test_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_cli)

    opt = parse_options(
        ["--name", name, "--ref_table_dir", TABLES, "--batchSize", "2",
         "--checkpoints_dir", str(tmp_path), "--compute_dtype", "f32",
         "--max_dataset_size", "2"] + cli_args, is_train=False)
    dl = create_dataloader(opt)
    batch = next(iter(dl))
    arrays = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, list)}
    nets = P.Pix2PixNets(opt)
    variables = nets.init_all(jax.random.PRNGKey(0), arrays)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}
    loaded = test_cli.load_any_checkpoint(opt, nets, variables, str(ckpt))
    assert loaded is not None
    data = P.preprocess_input(opt, arrays)
    ours = np.asarray(P.inference(nets, loaded, data)["fake_image"])

    with torch.no_grad():
        coor = tc(_nchw(data["ref_image"]), None,
                  _nchw(data["input_semantics"]),
                  _nchw(data["ref_semantics"]))
        cbn = torch.cat([coor["warp_out"], _nchw(data["input_semantics"])],
                        dim=1)
        theirs = tg(_nchw(data["input_semantics"]), warp_out=cbn).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    mse = float(np.mean((ours - theirs) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-20))
    print(f"{name}: synthetic-checkpoint PSNR vs torch = {psnr:.1f} dB")
    assert psnr >= 60.0, psnr
