#!/usr/bin/env python
"""Export a trained orbax TrainState to a lean inference checkpoint
(state_infer_<label>: just the gen/corr variables, EMA shadows preferred
when --use_ema), which test.py loads directly.

Usage:
  python tools/export_inference.py --name ade20k --checkpoints_dir ./checkpoints \
      [--which_epoch latest] [--use_ema] <other model flags>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from cocosnet_tpu.config import parse_options
    opt = parse_options(is_train=True)

    import jax
    import numpy as np
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.train import checkpoints as C
    from cocosnet_tpu.train import state as S

    nets = P.Pix2PixNets(opt)
    h = opt.crop_size
    fake_batch = {
        "label": np.zeros((1, h, h, 1), np.float32),
        "image": np.zeros((1, h, h, 3), np.float32),
        "ref": np.zeros((1, h, h, 3), np.float32),
        "label_ref": np.zeros((1, h, h, 1), np.float32),
        "self_ref": np.zeros((1,), np.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(0), fake_batch)
    state = S.create_train_state(opt, variables, jax.random.PRNGKey(0))
    state = C.load_state(opt, state, opt.which_epoch)
    print(f"loaded train state '{opt.which_epoch}' at step {int(state.step)}")

    infer_vars = S.ema_variables(state) if opt.use_ema else state.variables
    infer_vars = {k: v for k, v in infer_vars.items() if k in ("gen", "corr")}
    C.save_state(opt, infer_vars, f"infer_{opt.which_epoch}")
    print(f"wrote state_infer_{opt.which_epoch} under "
          f"{os.path.join(opt.checkpoints_dir, opt.name)}")


if __name__ == "__main__":
    main()
