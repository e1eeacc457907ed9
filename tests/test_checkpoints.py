"""Orbax train-state checkpoint roundtrip (the crash-only recovery story:
SURVEY §5 checkpoint/resume)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocosnet_tpu.config import test_defaults


def _tiny_setup(checkpoints_dir):
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.train import state as S

    opt = test_defaults(
        dataset_mode="ade20k", label_nc=5, contain_dontcare_label=True,
        crop_size=64, load_size=64, batchSize=2, ngf=8, ndf=8,
        maskmix=True, PONO=True, PONO_C=True, use_ema=True,
        use_pallas=False, isTrain=True, checkpoints_dir=checkpoints_dir,
        name="ckpt_test")
    nets = P.Pix2PixNets(opt)
    rs = np.random.RandomState(0)
    batch = {
        "label": jnp.asarray(rs.randint(0, 6, (2, 64, 64, 1)).astype(np.float32)),
        "image": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * 0.1),
        "ref": jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32) * 0.1),
        "label_ref": jnp.asarray(rs.randint(0, 6, (2, 64, 64, 1)).astype(np.float32)),
        "self_ref": jnp.ones((2,), jnp.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(0), batch)
    state = S.create_train_state(opt, variables, jax.random.PRNGKey(1))
    return opt, nets, state, batch


def test_state_roundtrip():
    from cocosnet_tpu.train import checkpoints as C
    from cocosnet_tpu.train import state as S, steps as ST

    with tempfile.TemporaryDirectory() as tmp:
        opt, nets, state, batch = _tiny_setup(tmp)
        train_step = jax.jit(ST.make_train_step(nets))
        state, metrics, _ = train_step(state, batch,
                                       jnp.asarray(S.lrs_for_epoch(opt, 1)))
        C.save_state(opt, state, "latest")
        restored = C.load_state(opt, state, "latest")
        assert int(restored.step) == int(state.step) == 1
        orig = jax.tree.leaves(state.variables["gen"]["params"])
        back = jax.tree.leaves(restored.variables["gen"]["params"])
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # EMA shadows roundtrip too
        for a, b in zip(jax.tree.leaves(state.ema), jax.tree.leaves(restored.ema)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored state continues training
        state2, m2, _ = train_step(restored, batch,
                                   jnp.asarray(S.lrs_for_epoch(opt, 1)))
        assert all(np.isfinite(float(v)) for v in m2.values())


def test_restored_state_runs_under_data_mesh():
    """Resume under a >1-device data mesh (train.py --continue_train with
    --mesh_data N). Orbax restores arrays COMMITTED to device 0, while a
    fresh-init state is uncommitted — jit then rejects the committed
    placement against a data-sharded batch ("incompatible devices", hit by
    the b32 global-batch-32 resume). train.py re-places the restored state
    replicated over the mesh; this pins that flow end-to-end."""
    from cocosnet_tpu import mesh as M
    from cocosnet_tpu.train import checkpoints as C
    from cocosnet_tpu.train import state as S, steps as ST

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    with tempfile.TemporaryDirectory() as tmp:
        opt, nets, state, batch = _tiny_setup(tmp)
        lr = jnp.asarray(S.lrs_for_epoch(opt, 1))
        train_step = jax.jit(ST.make_train_step(nets))
        state, _, _ = train_step(state, batch, lr)
        C.save_state(opt, state, "latest")
        restored = C.load_state(opt, state, "latest")

        mesh = M.create_mesh(data=2, model=1)
        M.set_global_mesh(mesh)
        restored = jax.device_put(restored, M.replicated(mesh))  # the fix
        sharded = {k: jax.device_put(v, M.batch_sharding(mesh))
                   for k, v in batch.items()}
        state2, m2, _ = train_step(restored, sharded, lr)
        assert all(np.isfinite(float(v)) for v in m2.values())
        assert int(state2.step) == 2


def test_lr_schedule():
    from cocosnet_tpu.train.state import lr_for_epoch, lrs_for_epoch
    opt = test_defaults(niter=10, niter_decay=10, lr=0.0002)
    # reference updates at END of each epoch and only once epoch > niter
    # (train.py:109, pix2pix_trainer.py:105-112): epoch e trains at
    # lr - max(0, e-1-niter)*lr/niter_decay
    assert lr_for_epoch(opt, 1) == 0.0002
    assert lr_for_epoch(opt, 11) == 0.0002   # first decay applies from ep 12
    np.testing.assert_allclose(lr_for_epoch(opt, 12), 0.00018)
    np.testing.assert_allclose(lr_for_epoch(opt, 16), 0.0001)
    np.testing.assert_allclose(lr_for_epoch(opt, 20), 0.00002)
    # TTUR split (pix2pix_model.py:97-102)
    np.testing.assert_allclose(lrs_for_epoch(opt, 1), [0.0001, 0.0004])
    np.testing.assert_allclose(lrs_for_epoch(opt, 16), [0.00005, 0.0002])
    # no_TTUR: the G param-group 'lr': lr*0.5 override holds until the
    # first decay rewrite (pix2pix_model.py:90-91, pix2pix_trainer.py:117)
    opt_n = opt.replace(no_TTUR=True)
    np.testing.assert_allclose(lrs_for_epoch(opt_n, 1), [0.0001, 0.0002])
    np.testing.assert_allclose(lrs_for_epoch(opt_n, 11), [0.0001, 0.0002])
    np.testing.assert_allclose(lrs_for_epoch(opt_n, 12), [0.00018, 0.00018])
