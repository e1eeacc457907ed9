"""Loss parity vs the reference implementations (imported via the harness)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cocosnet_tpu.losses.contextual import contextual_loss
from cocosnet_tpu.losses.gan import gan_loss
from tests import reference_harness as RH


@pytest.fixture(scope="module")
def ref_networks():
    return RH.load_reference()


@pytest.mark.parametrize("mode", ["hinge", "ls", "original", "w"])
@pytest.mark.parametrize("target_real,for_d", [(True, True), (False, True),
                                               (True, False)])
def test_gan_loss_parity(ref_networks, mode, target_real, for_d):
    if mode == "hinge" and not for_d and not target_real:
        pytest.skip("generator hinge loss must aim for real")
    torch.manual_seed(0)
    crit = ref_networks.loss.GANLoss(mode, tensor=torch.FloatTensor,
                                     opt=None)
    rs = np.random.RandomState(0)
    # multiscale nested list: 2 scales, each list of features + final logit
    preds_np = [[rs.randn(2, 4, 8, 8).astype(np.float32),
                 rs.randn(2, 1, 8, 8).astype(np.float32)] for _ in range(2)]
    want = crit([[torch.from_numpy(a) for a in scale] for scale in preds_np],
                target_real, for_discriminator=for_d)
    want = float(want.mean())
    got = float(gan_loss(
        [[jnp.asarray(np.transpose(a, (0, 2, 3, 1))) for a in scale]
         for scale in preds_np], target_real, for_d, mode))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("pono", [False, True])
def test_contextual_loss_parity(ref_networks, pono):
    topt = RH.make_opt(PONO=pono)
    from models.networks.ContextualLoss import ContextualLoss_forward
    crit = ContextualLoss_forward(topt)
    rs = np.random.RandomState(0)
    x = rs.rand(2, 32, 8, 8).astype(np.float32)
    y = rs.rand(2, 32, 8, 8).astype(np.float32)
    want = crit(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = contextual_loss(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
                          pono=pono)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_warp_mask_loss_matches_torch_unique_formula():
    """Vectorized class-presence weighting == the reference's per-sample
    torch.unique scan (pix2pix_model.py:261-276)."""
    from cocosnet_tpu.config import test_defaults
    from cocosnet_tpu.pix2pix import warp_mask_loss

    opt = test_defaults(label_nc=7, contain_dontcare_label=True,
                        weight_mask=100.0, crop_size=32)
    rs = np.random.RandomState(0)
    nc = 8
    b, fh = 2, 8
    warp_mask = rs.rand(b, fh, fh, nc).astype(np.float32)
    warp_mask /= warp_mask.sum(-1, keepdims=True)
    input_label = rs.randint(0, nc, (b, 32, 32)).astype(np.int32)
    ref_label = rs.randint(0, 5, (b, 32, 32)).astype(np.int32)

    got = float(warp_mask_loss(opt, jnp.asarray(warp_mask),
                               jnp.asarray(input_label),
                               jnp.asarray(ref_label)))

    # torch oracle following the reference lines
    import torch.nn.functional as F
    wm = torch.from_numpy(np.transpose(warp_mask, (0, 3, 1, 2)))
    gt = F.interpolate(torch.from_numpy(input_label)[:, None].float(),
                       scale_factor=0.25, mode="nearest").long().squeeze(1)
    ref = F.interpolate(torch.from_numpy(ref_label)[:, None].float(),
                        scale_factor=0.25, mode="nearest").long().squeeze(1)
    weights = []
    for i in range(b):
        ref_uniq = torch.unique(ref[i])
        gt_uniq = torch.unique(gt[i])
        zero_label = [it for it in gt_uniq if it not in ref_uniq]
        weight = torch.ones_like(gt[i]).float()
        for j in zero_label:
            weight[gt[i] == j] = 0
        weight[gt[i] == 0] = 0
        weights.append(weight[None])
    weights = torch.cat(weights, dim=0)
    nll = F.nll_loss(torch.log(wm + 1e-10), gt, reduction="none")
    want = float((nll * weights).sum() / (weights.sum() + 1e-5) * 100.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)
