"""Product-level spatial parallelism (--mesh_model): the FULL model with the
correlation's query rows sharded over the mesh's `model` axis must match the
single-device model bit-for-bit-ish (same f32 math, different placement).

Round-3 shipped the SP kernels as op-level capabilities (ops/corr_sp.py);
these tests pin the round-4 product wiring: CorrespondenceNet dispatches
attend_sp when opt.mesh_model > 1 (models/correspondence.py), the mesh comes
from cocosnet_tpu.mesh.set_global_mesh (set by train.py/test.py), and both
inference and the fused train step run unchanged over a (data, model) mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cocosnet_tpu import mesh as M
from cocosnet_tpu import pix2pix as PX
from cocosnet_tpu.config import test_defaults

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(autouse=True)
def _reset_global_mesh():
    yield
    M.set_global_mesh(None)


def _opt(**over):
    base = dict(dataset_mode="ade20k", label_nc=12,
                contain_dontcare_label=True, crop_size=64, load_size=64,
                batchSize=2, ngf=16, ndf=16, use_attention=True, maskmix=True,
                PONO=True, PONO_C=True, warp_mask_losstype="direct",
                match_kernel=3, vgg_normal_correct=True, isTrain=False,
                use_pallas=False)
    base.update(over)
    return test_defaults(**base)


def _batch(opt, batch=2):
    rs = np.random.RandomState(3)
    h = opt.crop_size
    return {
        "label": rs.randint(0, opt.semantic_nc,
                            (batch, h, h, 1)).astype(np.float32),
        "image": rs.randn(batch, h, h, 3).astype(np.float32) * 0.2,
        "ref": rs.randn(batch, h, h, 3).astype(np.float32) * 0.2,
        "label_ref": rs.randint(0, opt.semantic_nc,
                                (batch, h, h, 1)).astype(np.float32),
        "self_ref": np.asarray([1.0, 0.0], np.float32)[:batch],
    }


@pytest.mark.parametrize("mk", [3, 1])
def test_inference_parity_mesh_model(mk):
    """fake_image identical with the correlation sharded 4-way over `model`
    (x 2-way `data` batch sharding) vs one device."""
    opt1 = _opt(match_kernel=mk)
    opt4 = opt1.replace(mesh_model=4)
    nets1 = PX.Pix2PixNets(opt1)
    nets4 = PX.Pix2PixNets(opt4)
    batch = _batch(opt1)
    variables = nets1.init_all(jax.random.PRNGKey(0), batch)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}

    @jax.jit
    def run1(v, b):
        data = PX.preprocess_input(opt1, b)
        return PX.inference(nets1, v, data)["fake_image"]

    want = np.asarray(run1(variables, batch))

    mesh = M.create_mesh(data=2, model=4)
    M.set_global_mesh(mesh)
    vrep = jax.device_put(variables, M.replicated(mesh))
    bsh = M.shard_batch(mesh, batch)

    @jax.jit
    def run4(v, b):
        data = PX.preprocess_input(opt4, b)
        return PX.inference(nets4, v, data)["fake_image"]

    got = np.asarray(run4(vrep, bsh))
    # same f32 correlation math; generator runs in the test's default f32
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_train_step_parity_mesh_model():
    """One FULL fused G+D train step (all loss terms incl. the col-softmax
    cycle paths) over a (2, 4) mesh with SP correlation == single device."""
    from cocosnet_tpu.train import state as S, steps as ST

    common = dict(isTrain=True, weight_mask=50.0, warp_cycle_w=1.0,
                  use_ema=True)
    opt1 = _opt(**common)
    opt4 = opt1.replace(mesh_model=4)
    nets1 = PX.Pix2PixNets(opt1)
    nets4 = PX.Pix2PixNets(opt4)
    batch = _batch(opt1)

    variables = nets1.init_all(jax.random.PRNGKey(0), batch)
    state = S.create_train_state(opt1, variables, jax.random.PRNGKey(1))
    lr = jnp.asarray(S.lrs_for_epoch(opt1, 1))

    step1 = jax.jit(ST.make_train_step(nets1))
    _, metrics1, _ = step1(state, batch, lr)
    metrics1 = {k: float(v) for k, v in metrics1.items()}

    mesh = M.create_mesh(data=2, model=4)
    M.set_global_mesh(mesh)
    state4 = jax.device_put(state, M.replicated(mesh))
    bsh = M.shard_batch(mesh, batch)
    lr4 = jax.device_put(lr, M.replicated(mesh))
    step4 = jax.jit(ST.make_train_step(nets4))
    new_state, metrics4, _ = step4(state4, bsh, lr4)
    metrics4 = {k: float(v) for k, v in metrics4.items()}

    assert set(metrics1) == set(metrics4)
    # tolerance note: the correlation softmax runs at temperature 0.01, so
    # the SP path's last-bit f32 reduction-order differences are amplified
    # x100 in the logits; through the generator and a random-init D the
    # smallest-magnitude loss (GAN, ~0.03) moves a few 1e-3 absolute. The
    # op-level SP exactness is pinned at 2e-5 (tests/test_corr_sp.py) and
    # the fake image at 2e-4 (test_inference_parity_mesh_model above).
    for k in metrics1:
        assert np.isfinite(metrics4[k]), (k, metrics4)
        np.testing.assert_allclose(metrics4[k], metrics1[k], rtol=2e-2,
                                   atol=5e-3, err_msg=k)
    # the updated params must match too (grads flowed through shard_map)
    p1, _ = jax.tree.flatten(step1(state, batch, lr)[0].variables["corr"])
    p4, _ = jax.tree.flatten(new_state.variables["corr"])
    for a, b in zip(p1, p4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=5e-4)


def test_mesh_model_all_devices_on_model_axis():
    """data=1, model=8: pure sequence sharding (the 512px single-image
    scaling shape)."""
    opt1 = _opt(batchSize=1)
    opt8 = opt1.replace(mesh_model=8, mesh_data=1)
    nets1 = PX.Pix2PixNets(opt1)
    nets8 = PX.Pix2PixNets(opt8)
    batch = {k: v[:1] for k, v in _batch(opt1).items()}
    variables = nets1.init_all(jax.random.PRNGKey(0), batch)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}

    @jax.jit
    def run1(v, b):
        data = PX.preprocess_input(opt1, b)
        return PX.inference(nets1, v, data)["fake_image"]

    want = np.asarray(run1(variables, batch))

    mesh = M.create_mesh(data=1, model=8)
    M.set_global_mesh(mesh)
    vrep = jax.device_put(variables, M.replicated(mesh))
    bsh = M.shard_batch(mesh, batch)

    @jax.jit
    def run8(v, b):
        data = PX.preprocess_input(opt8, b)
        return PX.inference(nets8, v, data)["fake_image"]

    got = np.asarray(run8(vrep, bsh))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_sp_at_512px_feature_shape():
    """The halo/shape logic at the scale SP exists for: a 512px input gives a
    128x128 correlation grid (16384 query rows — the reference's quadratic
    object at correspondence.py:291-307 that doesn't fit one chip's memory at
    this size). Op-level parity vs the single-device streaming attend, model
    axis 4, reduced channels to keep the CPU cost bounded."""
    from cocosnet_tpu.ops.corr_sp import attend_sp
    from cocosnet_tpu.ops.corr_shift import attend_unfold

    b, h, w, c, d = 1, 128, 128, 8, 3
    rs = np.random.RandomState(11)
    q = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h * w, d).astype(np.float32))
    tau = 0.01

    want = np.asarray(jax.jit(
        lambda q, k, v: attend_unfold(q, k, v, tau, 3, True))(q, k, v))

    mesh = M.create_mesh(data=1, model=4)
    M.set_global_mesh(mesh)
    got = np.asarray(jax.jit(
        lambda q, k, v: attend_sp(q, k, v, tau, match_kernel=3, pono_c=True,
                                  use_pallas=False, model=4))(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def _corr_net_and_inputs(opt):
    from cocosnet_tpu.models.correspondence import CorrespondenceNet
    # register the (data=1, model=4) mesh BEFORE init: the SP dispatch
    # otherwise falls back to an all-devices mesh (data=2 on the 8-device
    # CI host), which batch 1 cannot shard over
    M.set_global_mesh(M.create_mesh(data=1, model=opt.mesh_model))
    net = CorrespondenceNet(opt)
    rs = np.random.RandomState(0)
    nc = opt.semantic_nc
    ref_img = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    sem = jax.nn.one_hot(jnp.asarray(rs.randint(0, nc, (1, 32, 32))), nc,
                         dtype=jnp.float32)
    ref_sem = jax.nn.one_hot(jnp.asarray(rs.randint(0, nc, (1, 32, 32))), nc,
                             dtype=jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        ref_img, None, sem, ref_sem, train=False)
    return net, variables, (ref_img, None, sem, ref_sem)


def test_mesh_model_explicit_matrix_path_warns():
    """--mesh_model with the WTA/return_corr explicit-matrix path runs
    replicated — it must say so loudly (VERDICT r4 weak #6)."""
    opt = _opt(batchSize=1, crop_size=32, load_size=32, ngf=16,
               mesh_model=4)
    net, variables, args = _corr_net_and_inputs(opt)
    M.set_global_mesh(M.create_mesh(data=1, model=4))
    with pytest.warns(UserWarning, match="explicit-matrix"):
        net.apply(variables, *args, train=False, return_corr=True)


def test_mesh_model_mk1_without_ponoc_warns():
    """--mesh_model with match_kernel=1 and no PONO_C falls back to the
    replicated dense-descriptor path — must warn, not silently unshard."""
    opt = _opt(batchSize=1, crop_size=32, load_size=32, ngf=16,
               match_kernel=1, PONO_C=False, mesh_model=4)
    net, variables, args = _corr_net_and_inputs(opt)
    M.set_global_mesh(M.create_mesh(data=1, model=4))
    with pytest.warns(UserWarning, match="requires --PONO_C"):
        net.apply(variables, *args, train=False)
