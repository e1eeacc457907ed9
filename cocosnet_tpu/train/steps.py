"""Jitted train / inference steps.

One fused `train_step` implements the reference's per-iteration schedule
(train.py:54-58, pix2pix_trainer.py:52-74): generator forward + all 11 loss
terms + Adam update on netG+netCorr, then the discriminator hinge update
reusing the same fake (detached), then the EMA shadow update. Under pjit with
the batch sharded over the `data` mesh axis this single program contains the
cross-replica gradient reductions — the DataParallel scatter/gather and
SyncBN callbacks of the reference dissolve into XLA collectives.

Spectral-norm state matches torch exactly: every forward in train mode
advances the power iteration (torch's pre-hook semantics), so D's u advances
twice per iteration — once in the G step's discriminate (mutable_disc
updates merged below), once in the D step — and G/Corr's once in the G
step. Pinned end-to-end by tests/test_trajectory_parity.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from cocosnet_tpu import pix2pix as P
from cocosnet_tpu.train import state as S

Vars = Dict[str, Any]


def _merge_updates(variables: Dict[str, Vars], updates: Dict[str, Vars]):
    out = dict(variables)
    for k, upd in updates.items():
        out[k] = {**out[k], **upd}
    return out


def _set_params(variables: Dict[str, Vars], params: Dict[str, Any]):
    out = dict(variables)
    for k, p in params.items():
        out[k] = {**out[k], "params": p}
    return out


def _trace_as_training(step_fn):
    """Trace the step inside ops.pallas_conv.training_trace(): convs pick
    their backend per shape AND per train/infer context (the fused conv
    wins inference 1.27x but loses the fwd+bwd A/B — see pallas_conv)."""
    import functools

    from cocosnet_tpu.ops import pallas_conv

    @functools.wraps(step_fn)
    def wrapped(*args, **kwargs):
        with pallas_conv.training_trace():
            return step_fn(*args, **kwargs)

    return wrapped


def make_multi_train_step(nets: P.Pix2PixNets):
    """K fused train steps in ONE compiled program (lax.scan over batches
    stacked on the leading axis) — one dispatch + one host sync per K
    iterations instead of per iteration.

    PROFILE_TRAIN.md (round 4) measured ~24-30 ms of dispatch round-trip per
    0.38 s step through the remote-runtime tunnel (~7%); train.py further
    fetches a NaN-probe scalar every step, serializing each dispatch. Over
    the reference's per-iter loop (/root/reference/train.py:48-58) the
    schedule is identical — scan(body) IS that loop, with the epoch-constant
    lr and the donated TrainState threaded through.

    multi_step(state, batches, lr) -> (state, metrics (K, ...) stacked
    per-step, visuals of the LAST step). batches: the per-step batch dict
    with every leaf stacked to (K, B, ...).
    """
    step = make_train_step(nets)

    def multi_step(state: S.TrainState, batches: Dict[str, jax.Array],
                   lr: jax.Array):
        def body(st, b):
            st, metrics, vis = step(st, b, lr)
            return st, (metrics, vis)

        state, (metrics, vis) = jax.lax.scan(body, state, batches)
        return state, metrics, jax.tree.map(lambda v: v[-1], vis)

    return multi_step


def make_train_step(nets: P.Pix2PixNets):
    opt = nets.opt
    tx_g, tx_d = S.make_optimizers(opt)

    def train_step(state: S.TrainState, batch: Dict[str, jax.Array],
                   lr: jax.Array):
        # lr: shape-(2,) [lr_G, lr_D] from S.lrs_for_epoch (traced so the
        # per-epoch decay never recompiles the step)
        data = P.preprocess_input(opt, batch)
        noise_rng, key = jax.random.split(state.noise_rng)
        variables = state.variables

        # ---------------- generator step --------------------------------
        def _forward(gp):
            vars_g = _set_params(variables, gp)
            return P.generate_fake(nets, vars_g, data, train=True,
                                   rngs={"noise": key}, mutable=True)

        if opt.remat_full:
            # nuclear option on top of --remat: recompute the ENTIRE
            # correspondence+generator forward in the backward pass (only the
            # step inputs are saved). --remat alone (per-SPADE-block remat
            # inside G/adaptors + VGG checkpoint, see models/generator.py)
            # reaches the same per-chip batch at far less recompute.
            _forward = jax.checkpoint(_forward)

        def g_loss_fn(gp):
            vars_g = _set_params(variables, gp)
            out, updates = _forward(gp)
            out["ref_features"] = P.vgg_features(nets, variables["vgg"],
                                                 data["ref_image"])
            out["real_features"] = P.vgg_features(nets, variables["vgg"],
                                                  data["real_image"])
            # mutable_disc: torch's spectral pre-hook advances D's power
            # iteration on this forward too (so D's u advances twice per
            # reference iteration); carrying the updates reproduces the
            # reference's spectral trajectory exactly
            losses, disc_upd = P.compute_generator_losses(
                nets, vars_g, data, out, variables["disc"], mutable_disc=True)
            total = sum(losses.values())
            return total, (losses, out, updates, disc_upd)

        (_, (g_losses, gen_out, g_updates, disc_upd)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(S.g_params(variables))

        variables = _merge_updates(variables, g_updates)
        if disc_upd:
            variables = _merge_updates(variables, {"disc": disc_upd})
        opt_g = optax.tree_utils.tree_set(state.opt_g,
                                          learning_rate=lr[0])
        g_up, opt_g = tx_g.update(g_grads, opt_g, S.g_params(variables))
        new_gp = optax.apply_updates(S.g_params(variables), g_up)
        variables = _set_params(variables, new_gp)

        ema = state.ema
        if opt.use_ema:
            ema = S.ema_update(ema, new_gp, opt.ema_beta)

        # ---------------- discriminator step ----------------------------
        def d_loss_fn(dp):
            vars_d = _set_params(variables, dp)
            # advance D's spectral power iteration inside its own step
            pred_fake, pred_real, _, d_updates = P.discriminate(
                nets, vars_d["disc"], data["input_semantics"],
                jax.lax.stop_gradient(gen_out["fake_image"]),
                data["real_image"], train=True, mutable=True)
            from cocosnet_tpu.losses.gan import gan_loss
            losses = {
                "D_Fake": gan_loss(pred_fake, False, True,
                                   opt.gan_mode) * opt.weight_gan,
                "D_real": gan_loss(pred_real, True, True,
                                   opt.gan_mode) * opt.weight_gan,
            }
            return sum(losses.values()), (losses, d_updates)

        (_, (d_losses, d_updates)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(S.d_params(variables))
        if d_updates:
            variables = _merge_updates(variables, {"disc": d_updates})
        opt_d = optax.tree_utils.tree_set(state.opt_d,
                                          learning_rate=lr[1])
        d_up, opt_d = tx_d.update(d_grads, opt_d, S.d_params(variables))
        new_dp = optax.apply_updates(S.d_params(variables), d_up)
        variables = _set_params(variables, new_dp)

        new_state = S.TrainState(
            step=state.step + 1,
            variables=variables,
            opt_g=opt_g,
            opt_d=opt_d,
            ema=ema,
            noise_rng=noise_rng,
        )
        metrics = {**g_losses, **d_losses}
        visuals = {
            "fake_image": gen_out["fake_image"],
            "warp_out": gen_out.get("warp_out"),
            "warp_mask": gen_out.get("warp_mask"),
        }
        return new_state, metrics, visuals

    return _trace_as_training(train_step)


def make_d_step(nets: P.Pix2PixNets):
    """Discriminator-only step for --D_steps_per_G > 1 iterations: the
    reference runs a D update every iteration but a G update only every
    D_steps_per_G-th, reusing the last G step's fake image
    (train.py:54-58, pix2pix_trainer.py:64-74)."""
    opt = nets.opt
    _, tx_d = S.make_optimizers(opt)

    def d_step(state: S.TrainState, batch, lr, fake_image):
        data = P.preprocess_input(opt, batch)
        variables = state.variables

        def d_loss_fn(dp):
            vars_d = _set_params(variables, dp)
            pred_fake, pred_real, _, d_updates = P.discriminate(
                nets, vars_d["disc"], data["input_semantics"],
                jax.lax.stop_gradient(fake_image),
                data["real_image"], train=True, mutable=True)
            from cocosnet_tpu.losses.gan import gan_loss
            losses = {
                "D_Fake": gan_loss(pred_fake, False, True,
                                   opt.gan_mode) * opt.weight_gan,
                "D_real": gan_loss(pred_real, True, True,
                                   opt.gan_mode) * opt.weight_gan,
            }
            return sum(losses.values()), (losses, d_updates)

        (_, (d_losses, d_updates)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(S.d_params(variables))
        if d_updates:
            variables = _merge_updates(variables, {"disc": d_updates})
        opt_d = optax.tree_utils.tree_set(state.opt_d,
                                          learning_rate=lr[1])
        d_up, opt_d = tx_d.update(d_grads, opt_d, S.d_params(variables))
        variables = _set_params(variables,
                                optax.apply_updates(S.d_params(variables),
                                                    d_up))
        new_state = S.TrainState(
            step=state.step + 1, variables=variables, opt_g=state.opt_g,
            opt_d=opt_d, ema=state.ema, noise_rng=state.noise_rng)
        return new_state, d_losses

    return _trace_as_training(d_step)


def make_inference_step(nets: P.Pix2PixNets):
    opt = nets.opt

    @jax.jit
    def inference_step(variables: Dict[str, Vars], batch, rng=None):
        data = P.preprocess_input(opt, batch)
        out = P.inference(nets, variables, data, rng=rng)
        return {"fake_image": out["fake_image"],
                "warp_out": out.get("warp_out")}

    return inference_step
