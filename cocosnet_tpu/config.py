"""Typed, immutable configuration for the TPU-native CoCosNet framework.

The reference (microsoft/CoCosNet) threads a mutable argparse Namespace into
every constructor (options/base_options.py:22-93, options/train_options.py:12-51,
options/test_options.py:12-22) and mutates it at runtime. Here every flag is a
field of one frozen dataclass; dataset-specific defaults (reference
data/*_dataset.py modify_commandline_options) are applied once at parse time.

Flag names are kept identical to the reference CLI so the published command
lines (reference README.md:45-115) work verbatim against our train.py/test.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Options:
    # ---- experiment specifics (base_options.py:22-31) ----
    name: str = "label2coco"
    gpu_ids: str = "0"                 # accepted for CLI parity; devices come from jax
    checkpoints_dir: str = "./checkpoints"
    model: str = "pix2pix"
    norm_G: str = "spectralspadesyncbatch3x3"  # generator sets this default (generator.py:20)
    norm_D: str = "spectralinstance"
    norm_E: str = "spectralinstance"
    phase: str = "train"

    # ---- input/output sizes (base_options.py:33-40) ----
    batchSize: int = 4
    preprocess_mode: str = "resize_and_crop"
    load_size: int = 256
    crop_size: int = 256
    aspect_ratio: float = 1.0
    label_nc: int = 182
    contain_dontcare_label: bool = False
    output_nc: int = 3

    # ---- data (base_options.py:43-51) ----
    dataroot: str = "./datasets/ade20k"
    dataset_mode: str = "ade20k"
    serial_batches: bool = False
    no_flip: bool = False
    nThreads: int = 4
    max_dataset_size: int = sys.maxsize
    load_from_opt_file: bool = False
    cache_filelist_write: bool = False
    cache_filelist_read: bool = False
    display_winsize: int = 256

    # ---- generator (base_options.py:57-62) ----
    netG: str = "spade"
    ngf: int = 64
    init_type: str = "xavier"
    init_variance: float = 0.02
    z_dim: int = 256

    # ---- CoCosNet-specific (base_options.py:65-93) ----
    CBN_intype: str = "warp_mask"
    maskmix: bool = False
    use_attention: bool = False
    warp_mask_losstype: str = "none"   # none | direct | cycle
    show_warpmask: bool = False
    match_kernel: int = 3
    adaptor_kernel: int = 3
    PONO: bool = False
    PONO_C: bool = False
    eqlr_sn: bool = False
    vgg_normal_correct: bool = False
    weight_domainC: float = 0.0
    domain_rela: bool = False
    use_ema: bool = False
    ema_beta: float = 0.999
    warp_cycle_w: float = 0.0
    two_cycle: bool = False
    apex: bool = False                 # parity no-op: TPU uses bf16 policy instead
    warp_bilinear: bool = False
    adaptor_res_deeper: bool = False
    adaptor_nonlocal: bool = False
    adaptor_se: bool = False
    dilation_conv: bool = False
    use_coordconv: bool = False
    warp_patch: bool = False
    warp_stride: int = 4
    mask_noise: bool = False
    noise_for_mask: bool = False
    video_like: bool = False

    # ---- discriminator (discriminator.py:19-28,76-77; train_options.py:30) ----
    netD: str = "multiscale"
    netD_subarch: str = "n_layer"
    num_D: int = 2
    n_layers_D: int = 4
    ndf: int = 64

    # ---- train schedule / optimizer (train_options.py:13-27) ----
    display_freq: int = 2000
    print_freq: int = 100
    save_latest_freq: int = 5000
    save_epoch_freq: int = 10
    continue_train: bool = False
    which_epoch: str = "latest"
    niter: int = 100
    niter_decay: int = 100
    optimizer: str = "adam"
    beta1: float = 0.5
    beta2: float = 0.999
    lr: float = 0.0002
    D_steps_per_G: int = 1

    # ---- loss weights (train_options.py:31-50) ----
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    no_ganFeat_loss: bool = False
    gan_mode: str = "hinge"
    no_TTUR: bool = False
    which_perceptual: str = "5_2"
    weight_perceptual: float = 0.01
    weight_mask: float = 0.0
    real_reference_probability: float = 0.7
    hard_reference_probability: float = 0.2
    weight_gan: float = 10.0
    novgg_featpair: float = 10.0
    D_cam: float = 0.0
    warp_self_w: float = 0.0
    fm_ratio: float = 0.1
    use_22ctx: bool = False
    ctx_w: float = 1.0
    mask_epoch: int = -1

    # ---- test (test_options.py:12-14) ----
    how_many: int = sys.maxsize
    show_corr: bool = False
    save_per_img: bool = False

    # ---- dataset extras (pix2pix_dataset.py:17-18) ----
    no_pairing_check: bool = False

    # ---- TPU-native extensions (no reference equivalent) ----
    isTrain: bool = True
    platform: str = ""                 # "", "tpu", "cpu" — "" = jax default
    compute_dtype: str = "bf16"        # bf16 | f32 matmul/conv compute precision
    use_pallas: bool = True            # fused correlation kernel on TPU
    mesh_data: int = 0                 # 0 = all visible devices on the data axis
    # spatial-parallel correlation: shard the correlation's query rows over
    # `model` mesh devices (ops/corr_sp.py). devices = mesh_data * mesh_model;
    # batchSize must divide the data axis. Requires PONO_C (the flagship
    # config); the WTA/return_corr explicit-matrix paths stay replicated.
    mesh_model: int = 1
    ref_table_dir: str = "./data"      # where *_ref*.txt retrieval tables live
    vgg_weights: str = "./assets/vgg19_conv.npz"
    seed: int = 0
    output_dir: str = "./output"
    log_compiles: bool = False
    allow_random_weights: bool = False  # let test.py/serve.py run uncheckpointed
    profile_dir: str = ""              # jax.profiler trace output (train)
    remat: bool = False                # per-SPADE-block + VGG remat (2x batch)
    remat_full: bool = False           # additionally checkpoint the whole G forward
    # what the per-SPADE-block remat saves across the backward:
    #   block      — only block inputs (max recompute, min memory)
    #   conv       — every conv output (backward recomputes only the
    #                elementwise/normalization chains)
    #   conv_small — conv outputs at <=64x64 spatial only (the MXU-heavy
    #                deep stacks); high-res convs recompute
    # default conv_small: wins the batch-8 256px A/B on v5e 16GB
    # (18.09 vs 17.21 block vs 16.18 conv img/s, PERF.md round-4) and
    # fits the same per-chip batch
    remat_policy: str = "conv_small"
    # train steps fused per dispatch (lax.scan in train/steps.py:
    # make_multi_train_step). 1 = the reference's per-iter loop; >1 removes
    # the per-step dispatch round-trip + NaN-probe sync (~7% of a 0.38 s
    # step through the remote-runtime tunnel, PROFILE_TRAIN.md). Losses
    # still log per step (the scan stacks per-step metrics); visuals render
    # from the last step of a chunk; D_steps_per_G>1 falls back to 1.
    steps_per_dispatch: int = 1
    # multi-host launch (jax.distributed): --distributed on each host; on TPU
    # pods the coordinator/process args auto-detect, elsewhere pass all three
    distributed: bool = False
    coordinator_address: str = ""      # host:port of process 0
    num_processes: int = -1            # -1 = auto-detect (TPU pod metadata)
    process_id: int = -1               # -1 = auto-detect
    dist_timeout_s: int = 900          # RegisterTask deadline (straggler hosts)

    # ---- derived (set in finalize) ----
    semantic_nc: int = 0
    epoch: int = 1                     # current epoch; reference mutates opt.epoch (train.py:37)
    down: int = 4                      # correspondence downscale (correspondence.py:162-166)

    def replace(self, **kw) -> "Options":
        return dataclasses.replace(self, **kw)

    @property
    def feature_hw(self) -> int:
        return self.crop_size // self.down

    @property
    def corr_n(self) -> int:
        hw = self.feature_hw
        return hw * hw


# Per-dataset defaults, mirroring each dataset's modify_commandline_options.
_DATASET_DEFAULTS = {
    # ade20k_dataset.py:12-25
    "ade20k": dict(preprocess_mode="resize_and_crop", crop_size=256,
                   display_winsize=256, label_nc=150, contain_dontcare_label=True),
    # celebahq_dataset.py:14-29
    "celebahq": dict(preprocess_mode="resize_and_crop", crop_size=256,
                     display_winsize=256, label_nc=19, contain_dontcare_label=False,
                     no_pairing_check=True),
    # celebahqedge_dataset.py:15-30
    "celebahqedge": dict(preprocess_mode="resize_and_crop", crop_size=256,
                         display_winsize=256, label_nc=15, contain_dontcare_label=False,
                         no_pairing_check=True),
    # deepfashion_dataset.py:16-31
    "deepfashion": dict(preprocess_mode="resize_and_crop", crop_size=256,
                        display_winsize=256, label_nc=20, contain_dontcare_label=False,
                        no_pairing_check=True),
    # flickr_dataset.py:9-23
    "flickr": dict(preprocess_mode="resize_and_crop", crop_size=256,
                   display_winsize=256, label_nc=150, contain_dontcare_label=True),
}


_BOOL_FIELDS = {f.name for f in dataclasses.fields(Options) if f.type in ("bool", bool)}


def build_parser(is_train: bool) -> argparse.ArgumentParser:
    """argparse parser with one flag per Options field, reference-compatible names."""
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False)
    for f in dataclasses.fields(Options):
        if f.name in ("isTrain", "semantic_nc", "epoch", "down"):
            continue
        flag = "--" + f.name
        if f.name in _BOOL_FIELDS:
            # reference uses action='store_true' flags
            p.add_argument(flag, action="store_true", default=f.default)
        elif f.type in ("int", int):
            p.add_argument(flag, type=int, default=f.default)
        elif f.type in ("float", float):
            p.add_argument(flag, type=float, default=f.default)
        else:
            p.add_argument(flag, type=str, default=f.default)
    return p


def _apply_phase_defaults(ns: argparse.Namespace, is_train: bool,
                          explicitly_set: set) -> None:
    """load_size defaults: 286 (train) / 256 (test) for all datasets
    (e.g. ade20k_dataset.py:15-19); test forces serial batches etc.
    (test_options.py:16-21)."""
    if "load_size" not in explicitly_set:
        ns.load_size = 286 if is_train else 256
    if not is_train:
        ns.serial_batches = True
        ns.no_flip = True
        ns.phase = "test"
        if "crop_size" not in explicitly_set:
            ns.crop_size = 256
        if "display_winsize" not in explicitly_set:
            ns.display_winsize = 256


def parse_options(argv=None, is_train: bool = True) -> Options:
    argv = list(sys.argv[1:] if argv is None else argv)
    explicitly_set = {a.lstrip("-").split("=")[0] for a in argv if a.startswith("--")}

    parser = build_parser(is_train)
    # dataset-specific defaults are applied before the final parse so explicit
    # flags still win (mirrors the three-stage parse, base_options.py:97-126)
    pre, _ = parser.parse_known_args(argv)
    for k, v in _DATASET_DEFAULTS.get(pre.dataset_mode, {}).items():
        parser.set_defaults(**{k: v})
    if pre.load_from_opt_file:
        # base_options.py:119-122,160-166: saved options become the defaults
        opt_path = os.path.join(pre.checkpoints_dir, pre.name, "opt.json")
        saved = load_options(opt_path)
        for k in _FIELD_NAMES:
            if k in ("isTrain", "phase", "semantic_nc", "epoch", "down",
                     "load_from_opt_file", "continue_train", "which_epoch"):
                continue
            parser.set_defaults(**{k: getattr(saved, k)})
    ns = parser.parse_args(argv)
    _apply_phase_defaults(ns, is_train, explicitly_set)

    d = vars(ns)
    d["isTrain"] = is_train
    d["phase"] = "train" if is_train else "test"
    return finalize(Options(**{k: v for k, v in d.items() if k in _FIELD_NAMES}))


_FIELD_NAMES = {f.name for f in dataclasses.fields(Options)}


def finalize(opt: Options) -> Options:
    """Derive semantic_nc (base_options.py:184-185) and the correspondence
    downscale factor (correspondence.py:162-166)."""
    semantic_nc = opt.label_nc + (1 if opt.contain_dontcare_label else 0)
    down = 2 if opt.warp_stride == 2 else 4
    return opt.replace(semantic_nc=semantic_nc, down=down)


def save_options(opt: Options, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(opt), f, indent=2, default=str)


def load_options(path: str) -> Options:
    with open(path) as f:
        d = json.load(f)
    d = {k: v for k, v in d.items() if k in _FIELD_NAMES}
    if d.get("max_dataset_size") is None:
        d["max_dataset_size"] = sys.maxsize
    return finalize(Options(**d))


def test_defaults(**kw) -> Options:
    """Convenience constructor for unit tests."""
    return finalize(Options(**kw))
