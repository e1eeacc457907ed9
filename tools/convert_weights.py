"""PyTorch -> JAX weight conversion for released CoCosNet checkpoints.

Converts the reference's per-network state_dicts (util/util.py:226-250
save/load format: <epoch>_net_{G,Corr,D}.pth, models/vgg19_conv.pth) into
our flax variable pytrees: NCHW conv kernels -> HWIO, spectral-norm
weight_orig/weight_u/weight_v -> params.kernel + spectral.{u,v}, BN running
stats -> batch_stats. Unmapped parameters (e.g. the discriminator's unused
`dec` head, SURVEY §2.11) are skipped, mirroring strict=False loading.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cocosnet_tpu.train.checkpoints import (convert_torch_module,
                                            default_name_map,
                                            load_torch_state_dict)

Vars = Dict[str, Any]


def merge_into(template: Vars, converted: Vars) -> Vars:
    """Overlay converted leaves onto an init-built template (keeps leaves the
    checkpoint doesn't carry, and validates shapes)."""
    import jax

    def overlay(tpl, conv, path=""):
        out = dict(tpl)
        for k, v in conv.items():
            if k not in tpl:
                # parameter with no flax counterpart — ignore (strict=False)
                continue
            if isinstance(v, dict):
                out[k] = overlay(tpl[k], v, f"{path}/{k}")
            else:
                if tuple(tpl[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{tpl[k].shape} vs {v.shape}")
                out[k] = v.astype(tpl[k].dtype)
        return out

    return overlay(template, converted)


def convert_vgg(pth_path: str, template: Vars = None) -> Vars:
    sd = load_torch_state_dict(pth_path)
    out = convert_torch_module(sd, default_name_map)
    return merge_into(template, out) if template is not None else out


def load_vgg_npz(npz_path: str, template: Vars) -> Vars:
    data = np.load(npz_path)
    out: Vars = {"params": {}}
    for key in data.files:
        parts = key.split("/")
        node = out["params"]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return merge_into(template, out)


def convert_vgg_to_npz(pth_path: str, npz_path: str) -> int:
    """Convert the released vgg19_conv.pth into the assets/vgg19_conv.npz
    the training/eval tools auto-detect. Returns the array count."""
    out = convert_vgg(pth_path)
    flat = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(out["params"])
    d = os.path.dirname(npz_path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(npz_path, **flat)
    return len(flat)


def convert_generator(pth_path: str, template: Vars = None) -> Vars:
    sd = load_torch_state_dict(pth_path)
    out = convert_torch_module(sd, default_name_map)
    return merge_into(template, out) if template is not None else out


def convert_corr(pth_path: str, template: Vars = None) -> Vars:
    sd = load_torch_state_dict(pth_path)
    out = convert_torch_module(sd, default_name_map)
    return merge_into(template, out) if template is not None else out


def _disc_name_map(tname: str, value: np.ndarray):
    """NLayerDiscriminator name fixups: model0.0 -> model0_conv,
    modelN.0.0 -> modelN_conv.conv, final modelK.0 -> modelK_conv; the unused
    seg-decoder `dec.*` is dropped."""
    parts = tname.split(".")
    if len(parts) >= 2 and parts[1].startswith("dec"):
        return None
    if len(parts) >= 2 and parts[1].startswith("model"):
        scale, model = parts[0], parts[1]
        rest = parts[2:]
        if rest[:1] == ["0"]:
            rest = rest[1:]
            if rest[:1] == ["0"]:  # norm-wrapped conv
                rest = ["conv"] + rest[1:]
        tname = ".".join([scale, model + "_conv"] + rest)
    return default_name_map(tname, value)


def convert_discriminator(pth_path: str, template: Vars = None) -> Vars:
    sd = load_torch_state_dict(pth_path)
    out = convert_torch_module(sd, _disc_name_map)
    return merge_into(template, out) if template is not None else out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", help="path to vgg19_conv.pth")
    ap.add_argument("--out", default="assets/vgg19_conv.npz")
    args = ap.parse_args()
    if args.vgg:
        n = convert_vgg_to_npz(args.vgg, args.out)
        print(f"wrote {args.out} with {n} arrays")


if __name__ == "__main__":
    main()
