"""Checkpoint save/load (orbax) + PyTorch checkpoint import.

Reference: per-network `<epoch>_net_<label>.pth` state_dicts with tolerant
loading (util/util.py:226-250), optimizer.pth (pix2pix_trainer.py:95-99).
Here the whole TrainState (all nets' variables, both optax states, EMA,
step) is one orbax checkpoint per epoch label; `import_torch_checkpoints`
converts released reference .pth files into our variable pytrees
(NCHW->HWIO kernels, spectral weight_orig/u/v carried over) so released
CoCosNet models run on TPU unchanged.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Vars = Dict[str, Any]


# ------------------------------------------------------------------ orbax

def _ckpt_dir(opt, label: str) -> str:
    return os.path.abspath(
        os.path.join(opt.checkpoints_dir, opt.name, f"state_{label}"))


def save_state(opt, state, label: str) -> None:
    """Overwrite-safe save: orbax's force=True deletes the existing
    directory BEFORE the new checkpoint lands, leaving a seconds-long window
    where a concurrent reader (test.py / serve.py against a live training
    run) sees no checkpoint at all. Write to a side path and swap instead,
    so `state_<label>` always points at a complete checkpoint.

    Multi-host: filesystem mutations (side-path cleanup + the rename swap)
    happen only on process 0 — the checkpoint directory is shared, and
    concurrent rmtree/rename from every host race each other. The orbax save
    itself is collective (every process contributes its array shards). A
    crash between the two renames leaves only `state_<label>.old`, which the
    loaders below fall back to."""
    import shutil

    import orbax.checkpoint as ocp
    path = _ckpt_dir(opt, label)
    new_path = path + ".new"
    old_path = path + ".old"
    if jax.process_index() == 0:
        shutil.rmtree(new_path, ignore_errors=True)
        shutil.rmtree(old_path, ignore_errors=True)
    _barrier()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(new_path, state, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        if os.path.exists(path):
            os.rename(path, old_path)
        os.rename(new_path, path)   # atomic on POSIX
        shutil.rmtree(old_path, ignore_errors=True)
    _barrier()


def _barrier() -> None:
    """Cross-process sync so no host reads/writes the checkpoint paths while
    process 0 is still mutating them. No-op single-process."""
    if jax.process_count() > 1:
        import jax.experimental.multihost_utils as mhu
        mhu.sync_global_devices("cocosnet_ckpt_swap")


def _resolve_ckpt_path(path: str) -> str:
    """Prefer `state_<label>`; fall back to `state_<label>.old` (left behind
    if a crash hit between save_state's two renames) so an interrupted
    overwrite never strands an unloadable run."""
    if os.path.exists(path):
        return path
    old_path = path + ".old"
    if os.path.exists(old_path):
        print(f"WARNING: {path} missing; falling back to {old_path} "
              "(interrupted checkpoint swap)")
        return old_path
    return path  # let orbax raise its usual not-found error


def load_state(opt, like_state, label: str):
    import orbax.checkpoint as ocp
    path = _resolve_ckpt_path(_ckpt_dir(opt, label))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, like_state)
    return restored


def load_raw(opt, label: str):
    """Restore a checkpoint without a target structure (plain nested dicts of
    numpy arrays). Lets test.py pull gen/corr out of a full TrainState saved
    by train.py without constructing discriminator/VGG/optimizer templates."""
    import orbax.checkpoint as ocp
    path = _resolve_ckpt_path(_ckpt_dir(opt, label))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def infer_vars_from_train_state(raw: Dict, template: Vars,
                                use_ema: bool) -> Vars:
    """Extract inference variables (gen + corr) from a raw TrainState dict,
    preferring the EMA shadows when --use_ema (pix2pix_model.py:134-136)."""
    variables = raw["variables"]
    out = {}
    for net in ("gen", "corr"):
        v = dict(variables[net])
        if use_ema and raw.get("ema") is not None:
            v["params"] = raw["ema"][net]
        out[net] = v
    from tools.convert_weights import merge_into
    return {net: merge_into(template[net], out[net]) for net in ("gen", "corr")}


# ----------------------------------------------------- torch .pth import

def _to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _set(tree: Dict, keys, value) -> None:
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = jnp.asarray(value)


def convert_torch_module(sd: Dict[str, np.ndarray],
                         name_map) -> Dict[str, Dict]:
    """Generic converter: name_map maps torch parameter names to
    (collection, path tuple, transform) entries; unmapped names are skipped
    (the reference loads with strict=False likewise, util.py:246-249)."""
    out: Dict[str, Dict] = {"params": {}, "spectral": {}, "batch_stats": {}}
    for tname, value in sd.items():
        entry = name_map(tname, value)
        if entry is None:
            continue
        collection, path, transform = entry
        _set(out[collection], path, transform(value))
    return {k: v for k, v in out.items() if v}


def default_name_map(tname: str, value: np.ndarray):
    """Maps torch names to our flax trees for modules whose flax names mirror
    the torch module names (VGG, generator blocks, correspondence, ...).

    Handles: weight/bias, spectral weight_orig/weight_u/weight_v, PReLU
    weight, BN running stats, attention gamma, Sequential indices for
    norm-wrapped convs (('layer1', '0') -> ('layer1', 'conv')) and SPADE
    mlp_shared (('mlp_shared', '1') -> ('mlp_shared',)).
    """
    parts = tname.split(".")
    leaf = parts[-1]
    path = parts[:-1]

    # Sequential index fixups
    fixed = []
    for i, p in enumerate(path):
        if p.isdigit():
            prev = path[i - 1] if i else ""
            if prev == "layer":
                # corr residual stack: layer.0 -> layer_0
                fixed[-1:] = [f"layer_{p}"]
            elif prev.startswith("layer") or prev.startswith("degridding"):
                # norm-wrapped conv Sequential: layer1.0 -> layer1.conv
                fixed.append("conv")
            elif prev == "mlp_shared":
                pass  # mlp_shared.1 (conv) -> mlp_shared
            else:
                fixed.append(p)
        else:
            fixed.append(p)
    path = fixed

    if leaf == "weight":
        if value.ndim == 4:
            return ("params", path + ["kernel"], _to_hwio)
        if value.ndim == 2:
            return ("params", path + ["kernel"], lambda v: v.T)
        if value.ndim == 0 or (value.ndim == 1 and value.size == 1):
            # PReLU slope
            return ("params", path + ["alpha"], lambda v: np.squeeze(v))
        # 1-D affine norm weight
        return ("params", path + ["scale"], lambda v: v)
    if leaf == "bias":
        return ("params", path + ["bias"], lambda v: v)
    if leaf == "weight_orig":
        if value.ndim == 4:
            return ("params", path + ["kernel"], _to_hwio)
        return ("params", path + ["kernel"], lambda v: v.T)
    if leaf == "weight_u":
        return ("spectral", path + ["u"], lambda v: v)
    if leaf == "weight_v":
        return ("spectral", path + ["v"], lambda v: v)
    if leaf == "gamma":
        return ("params", path + ["gamma"], lambda v: np.squeeze(v))
    if leaf == "running_mean":
        return ("batch_stats", path + ["mean"], lambda v: v)
    if leaf == "running_var":
        return ("batch_stats", path + ["var"], lambda v: v)
    if leaf == "num_batches_tracked":
        return None
    return None
