"""bf16 activation-policy consistency: policy-on inference must stay close
to f32 (statistics/softmax/losses remain f32 by construction)."""
import jax
import jax.numpy as jnp
import numpy as np

from cocosnet_tpu.config import test_defaults
from cocosnet_tpu.nn import layers as L


def test_bf16_policy_inference_close_to_f32():
    from cocosnet_tpu import pix2pix as P

    opt = test_defaults(dataset_mode="ade20k", label_nc=8,
                        contain_dontcare_label=True, crop_size=64,
                        load_size=64, batchSize=2, ngf=16, ndf=16,
                        use_attention=True, maskmix=True, PONO=True,
                        PONO_C=True, use_pallas=False, isTrain=False)
    nets = P.Pix2PixNets(opt)
    rs = np.random.RandomState(0)
    batch = {
        "label": jnp.asarray(rs.randint(0, 9, (2, 64, 64, 1)).astype(np.float32)),
        "image": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * 0.3),
        "ref": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * 0.3),
        "label_ref": jnp.asarray(rs.randint(0, 9, (2, 64, 64, 1)).astype(np.float32)),
        "self_ref": jnp.ones((2,), jnp.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(0), batch)
    data = P.preprocess_input(opt, batch)

    try:
        L.set_compute_dtype(None)
        out32 = P.inference(nets, variables, data)["fake_image"]
        L.set_compute_dtype(jnp.bfloat16)
        out16 = P.inference(nets, variables, data)["fake_image"]
    finally:
        L.set_compute_dtype(None)

    assert out16.dtype == jnp.float32  # generator re-emits f32
    err = float(jnp.max(jnp.abs(out16 - out32)))
    # tanh outputs in [-1,1]; bf16 activations through ~20 layers
    assert err < 0.15, err
    assert float(jnp.mean(jnp.abs(out16 - out32))) < 0.02
