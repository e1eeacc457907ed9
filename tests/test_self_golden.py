"""Self-golden regression: fixed-seed inference output snapshot, generated at
round 1 (tests/golden/self_golden.npz). Guards every refactor of the model
stack against silent numerical drift. Regenerate deliberately with
`python -m tests.regen_golden` if a change is *intended* to alter outputs."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from cocosnet_tpu.config import test_defaults

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "self_golden.npz")


def test_self_golden():
    from cocosnet_tpu import pix2pix as P

    opt = test_defaults(dataset_mode="ade20k", label_nc=8,
                        contain_dontcare_label=True, crop_size=64,
                        load_size=64, batchSize=2, ngf=16, ndf=16,
                        use_attention=True, maskmix=True, PONO=True,
                        PONO_C=True, warp_mask_losstype="direct",
                        use_pallas=False, isTrain=False)
    nets = P.Pix2PixNets(opt)
    rs = np.random.RandomState(123)
    batch = {
        "label": jnp.asarray(rs.randint(0, 9, (2, 64, 64, 1)).astype(np.float32)),
        "image": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * 0.3),
        "ref": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * 0.3),
        "label_ref": jnp.asarray(rs.randint(0, 9, (2, 64, 64, 1)).astype(np.float32)),
        "self_ref": jnp.ones((2,), jnp.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(42), batch)
    data = P.preprocess_input(opt, batch)
    out = P.inference(nets, variables, data)
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(out["fake_image"]), ref["fake"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["warp_out"]), ref["warp"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["warp_mask"]), ref["mask"],
                               atol=1e-4)
