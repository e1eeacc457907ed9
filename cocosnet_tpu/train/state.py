"""Training state: one pytree holding every network's variables, both optax
optimizer states, the EMA shadows, and the step counter.

Optimizer parity (pix2pix_model.py:88-107, pix2pix_trainer.py:105-125):
- TTUR default: betas (0, 0.9); G nets at lr*0.5 (the param-group lr
  override), D at lr*2; Adam eps 1e-3 for G, 1e-8 for D.
- no_TTUR: betas (beta1, beta2), both at lr (G still eps 1e-3).
- Linear decay after epoch > niter: lr falls by lr/niter_decay per epoch;
  under TTUR the decayed lr is split G=new_lr/2, D=new_lr*2
  (pix2pix_trainer.py:105-125). The lr enters the jitted step as a traced
  scalar so decay never triggers recompilation.
- EMA (generator.py:259-287): shadow = (1-beta)*p + beta*shadow over netG +
  netCorr params, updated after each G step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from cocosnet_tpu.config import Options

Vars = Dict[str, Any]


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    variables: Dict[str, Vars]            # gen / corr / disc / vgg / ...
    opt_g: optax.OptState
    opt_d: optax.OptState
    ema: Optional[Dict[str, Any]]          # shadow params for gen+corr
    noise_rng: jax.Array


def lr_for_epoch(opt: Options, epoch: int) -> float:
    """Base learning rate in effect while training epoch `epoch`.

    The reference calls update_learning_rate at the END of each epoch
    (train.py:109) and it only changes anything once its epoch arg exceeds
    niter (pix2pix_trainer.py:105-112), so epoch e trains at
    lr - max(0, e-1-niter) * lr/niter_decay.
    """
    decay_steps = max(0, epoch - 1 - opt.niter)
    decayed = opt.lr - decay_steps * opt.lr / max(opt.niter_decay, 1)
    return max(decayed, 0.0)


def lrs_for_epoch(opt: Options, epoch: int):
    """Effective (G, D) learning rates for `epoch`, matching the reference's
    torch behavior exactly:

    - The G optimizer's param groups carry an explicit 'lr': opt.lr*0.5
      override (pix2pix_model.py:90-91) which torch honors over the
      optimizer-level G_lr, so G trains at lr*0.5 under TTUR *and* no_TTUR
      until the first decay update rewrites the group lrs
      (pix2pix_trainer.py:112-121).
    - After decay starts: TTUR splits new_lr/2 vs new_lr*2; no_TTUR sets
      both nets to new_lr.
    """
    base = lr_for_epoch(opt, epoch)
    if opt.no_TTUR:
        decay_started = epoch - 1 > opt.niter
        g = base if decay_started else opt.lr * 0.5
        d = base
    else:
        g, d = base * 0.5, base * 2.0
    return np.asarray([g, d], np.float32)


def make_optimizers(opt: Options):
    if opt.no_TTUR:
        b1, b2 = opt.beta1, opt.beta2
    else:
        b1, b2 = 0.0, 0.9
    # lr injected per-step (traced), so the values here are just epoch-1's
    lr_g, lr_d = (float(x) for x in lrs_for_epoch(opt, 1))
    opt_g = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=b1, b2=b2,
                                         eps=1e-3))(learning_rate=lr_g)
    opt_d = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=b1, b2=b2,
                                         eps=1e-8))(learning_rate=lr_d)
    return opt_g, opt_d


def g_params(variables: Dict[str, Vars]):
    """The generator-side trainable pytree: netG + netCorr params
    (pix2pix_model.py:90-91)."""
    return {"gen": variables["gen"]["params"],
            "corr": variables["corr"]["params"]}


def d_params(variables: Dict[str, Vars]):
    out = {"disc": variables["disc"]["params"]}
    if "domain_classifier" in variables:
        out["domain_classifier"] = variables["domain_classifier"]["params"]
    return out


def create_train_state(opt: Options, variables: Dict[str, Vars],
                       rng: jax.Array) -> TrainState:
    tx_g, tx_d = make_optimizers(opt)
    ema = None
    if opt.use_ema:
        ema = jax.tree.map(jnp.copy, g_params(variables))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        variables=variables,
        opt_g=tx_g.init(g_params(variables)),
        opt_d=tx_d.init(d_params(variables)),
        ema=ema,
        noise_rng=rng,
    )


def ema_update(ema, params, beta: float):
    """generator.py:268-274: shadow = (1-beta)*p + beta*shadow."""
    return jax.tree.map(lambda s, p: beta * s + (1.0 - beta) * p, ema, params)


def ema_variables(state: TrainState) -> Dict[str, Vars]:
    """Swap EMA shadows in for eval (generator.py:276-281)."""
    if state.ema is None:
        return state.variables
    v = dict(state.variables)
    v["gen"] = {**v["gen"], "params": state.ema["gen"]}
    v["corr"] = {**v["corr"], "params": state.ema["corr"]}
    return v
