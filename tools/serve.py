#!/usr/bin/env python
"""Persistent inference server: watches an input directory for exemplar
translation requests, runs them through the SAME label preprocessing as the
dataset pipelines, and writes results.

Deployment-shaped, continuous batching: the jitted program stays resident
(weights on device) and four pipeline stages overlap —

  watcher            polls --watch_dir for new request ids
  preprocess pool    --nThreads host workers run the dataset label
                     pipelines (PIL/cv2/native DT) concurrently
  dispatcher         packs whatever is ready into a fixed-size batch the
                     moment either the batch fills or --batch_window_ms
                     expires (tail slots padded), then dispatches; JAX's
                     async dispatch keeps up to 2 batches in flight
  writer             blocks on device results, writes PNGs, records
                     per-request END-TO-END latency (discovery -> file)

so host decode, device compute, and result writing all overlap. One
compiled executable serves everything (static shapes); per-request p50/p99
latency is reported alongside throughput.

Usage:
  python tools/serve.py --name ade20k --dataset_mode ade20k \
      --checkpoints_dir ./checkpoints --watch_dir /path/in --out_dir /path/out

Request layout per request id R (in --watch_dir):
  R.ref.jpg          exemplar photo (any PIL-readable format works)
  R.label.*          structural input for the label pipeline (see below)
  R.ref_label.*      same format, describing the exemplar — REQUIRED: the
                     correspondence net consumes the exemplar's semantics
                     (ref_semantics, pix2pix_model.py:308), they are not
                     derivable from the input label
Output: <out_dir>/R.png|jpg|npy per --out_format (uint8 quantization runs
ON DEVICE so the tunnel moves 4x fewer bytes and the writer does no float
math; --out_format npy skips image encoding entirely), or
<out_dir>/R.error.txt on a bad request.

Label input formats, matching each dataset's get_label_tensor:
  ade20k / flickr    R.label.png — grayscale class-id mask
  celebahq           R.label.txt — one line: the all_parts_except_glasses
                       mask path (the pipeline finds the matching _eye_g
                       glasses mask itself, celebahq_dataset.py:67-84)
  celebahqedge       R.label.txt — one line: the mask-anno template path,
                       e.g. /data/CelebAMask-HQ/CelebAMask-HQ-mask-anno/0/00000_{}.png
                       (the dataset pipeline opens <template>.format(part)
                       per facial part and the matching CelebA-HQ-img photo)
  deepfashion        R.label.txt — one line: the OpenPose template path,
                       e.g. /data/DeepFashion/pose/.../x_{}.txt
                       (formatted with candidate/subset; the matching img/
                       photo is derived from the path)
"""

import argparse
import collections
import hashlib
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

# dataset modes whose labels are plain class-id PNG masks
_MASK_MODES = ("ade20k", "flickr")
# modes whose label pipeline resolves a path (template) to the raw assets
_PATH_MODES = ("celebahq", "celebahqedge", "deepfashion")


def make_label_pipeline(opt):
    """A bound `get_label_tensor` from the dataset class for opt.dataset_mode,
    without walking a dataroot: preprocessing must match data/*.py exactly or
    the model sees out-of-distribution inputs (ADVICE round 1)."""
    from cocosnet_tpu.data.loader import dataset_registry
    cls = dataset_registry()[opt.dataset_mode]
    ds = cls.__new__(cls)  # get_label_tensor only needs opt + rng
    ds.opt = opt
    ds.rng = random.Random(opt.seed)
    return ds


def resolve_label_input(opt, watch_dir, req):
    """-> path to feed get_label_tensor, or raises ValueError."""
    if opt.dataset_mode in _MASK_MODES:
        p = os.path.join(watch_dir, req + ".png")
        if not os.path.exists(p):
            raise ValueError(f"missing {p}")
        return p
    p = os.path.join(watch_dir, req + ".txt")
    if not os.path.exists(p):
        raise ValueError(f"missing {p} (path-template request file)")
    with open(p) as f:
        template = f.read().strip()
    if not template:
        raise ValueError(f"{p} is empty")
    return template


def main():
    argv = sys.argv[1:]
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--watch_dir", required=True)
    extra.add_argument("--out_dir", required=True)
    extra.add_argument("--poll_s", type=float, default=0.5)
    extra.add_argument("--once", action="store_true",
                       help="serve pending requests then exit (for tests)")
    extra.add_argument("--batch_window_ms", type=float, default=25.0,
                       help="max time the dispatcher waits to fill a batch "
                            "once at least one request is ready")
    extra.add_argument("--out_format", choices=("png", "jpg", "npy"),
                       default="png",
                       help="result encoding: png (lossless), jpg (fast, "
                            "lossy, quality 92), npy (raw uint8 HWC — "
                            "near-zero host encode cost)")
    extra.add_argument("--png_level", type=int, default=1,
                       help="zlib level for png results. PNG is lossless at "
                            "every level; 1 encodes ~4x faster than PIL's "
                            "default 6 for ~20%% larger files — the right "
                            "trade on a host-bound server")
    extra.add_argument("--preprocess_cache", type=int, default=256,
                       help="entries in the content-hash decode/preprocess "
                            "cache (repeated exemplars/labels skip PIL + "
                            "transforms); 0 disables")
    extra_ns, rest = extra.parse_known_args(argv)
    from cocosnet_tpu.config import parse_options
    opt = parse_options(rest, is_train=False)
    if opt.dataset_mode not in _MASK_MODES + _PATH_MODES:
        raise SystemExit(f"serve.py cannot preprocess labels for "
                         f"--dataset_mode {opt.dataset_mode}")

    import jax
    import jax.numpy as jnp

    from cocosnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from cocosnet_tpu.nn import layers as L
    if opt.compute_dtype == "bf16":
        L.set_compute_dtype(jnp.bfloat16)
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.data import transforms as T
    from cocosnet_tpu.train.steps import make_inference_step
    import test as test_cli

    pipeline = make_label_pipeline(opt)
    h = opt.crop_size
    b = opt.batchSize
    # label channel count per dataset (static shapes -> one compiled program)
    label_ch = {"ade20k": 1, "flickr": 1, "celebahq": 2,
                "celebahqedge": 15, "deepfashion": 20}[opt.dataset_mode]
    nets = P.Pix2PixNets(opt)
    zero_batch = {
        "label": np.zeros((b, h, h, label_ch), np.float32),
        "image": np.zeros((b, h, h, 3), np.float32),
        "ref": np.zeros((b, h, h, 3), np.float32),
        "label_ref": np.zeros((b, h, h, label_ch), np.float32),
        "self_ref": np.zeros((b,), np.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(opt.seed), zero_batch)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.name)
    loaded = test_cli.load_any_checkpoint(opt, nets, variables, ckpt_dir)
    if loaded is not None:
        variables = loaded
    elif opt.allow_random_weights:
        print(f"WARNING: no checkpoint under {ckpt_dir}; serving RANDOM "
              "weights (--allow_random_weights)", flush=True)
    else:
        raise SystemExit(f"No checkpoint found under {ckpt_dir}; refusing to "
                         "serve random weights (--allow_random_weights to "
                         "override)")
    # Fused inference + on-device uint8 quantization: the tensor2im math
    # (utils/visuals.py, floor((y+1)*127.5+0.5) byte-exact) runs on the MXU's
    # host-free side, so the per-batch device->host transfer is uint8 (4x
    # fewer bytes over the remote-runtime tunnel) and the writer does zero
    # float math per image.
    base_step = make_inference_step(nets)

    @jax.jit
    def step(v, b):
        y = base_step(v, b)["fake_image"].astype(jnp.float32)
        return jnp.clip(jnp.floor((y + 1.0) * 127.5 + 0.5),
                        0.0, 255.0).astype(jnp.uint8)

    step(variables, zero_batch)  # compile once up front
    os.makedirs(extra_ns.out_dir, exist_ok=True)
    print(f"serving {opt.dataset_mode} from {extra_ns.watch_dir} "
          f"(batch {b}, {h}px, {label_ch}ch labels); compiled and resident",
          flush=True)

    import queue
    import threading

    # Content-hash decode/preprocess cache: production exemplar serving
    # reuses a catalogue of reference photos/labels, and the host PIL decode
    # + transform chain is this server's measured bottleneck (PERF.md). Keyed
    # by file CONTENT (requests arrive as per-id copies, so path+mtime would
    # never hit); hashing 100 KB is ~100x cheaper than decoding it.
    cache_n = extra_ns.preprocess_cache
    pre_cache: "collections.OrderedDict" = collections.OrderedDict()
    cache_lock = threading.Lock()

    def _content_key(kind, path_or_template, salt=""):
        if os.path.exists(path_or_template):
            with open(path_or_template, "rb") as f:
                return (kind, hashlib.md5(f.read()).hexdigest(), salt)
        # path-template request (celebahq*/deepfashion): the template names
        # static dataset assets; the string identifies them
        return (kind, path_or_template, salt)

    def cached(kind, path, fn, salt=""):
        if not cache_n:
            return fn()
        key = _content_key(kind, path, salt)
        with cache_lock:
            if key in pre_cache:
                pre_cache.move_to_end(key)
                return pre_cache[key]
        val = fn()
        with cache_lock:
            pre_cache[key] = val
            while len(pre_cache) > cache_n:
                pre_cache.popitem(last=False)
        return val

    def load_request(req):
        """-> item dict (label/ref/label_ref) via the dataset pipeline."""
        label_in = resolve_label_input(opt, extra_ns.watch_dir,
                                       req + ".label")
        ref_label_in = resolve_label_input(opt, extra_ns.watch_dir,
                                           req + ".ref_label")
        ref_path = os.path.join(extra_ns.watch_dir, req + ".ref.jpg")
        if not os.path.exists(ref_path):
            raise ValueError(f"missing {ref_path}")
        label, _ = cached("label", label_in,
                          lambda: pipeline.get_label_tensor(label_in))
        ref_label, ref_params = cached(
            "label", ref_label_in,
            lambda: pipeline.get_label_tensor(ref_label_in))
        # the ref transform takes params from the ref_label pipeline, so the
        # cache key carries them (deterministic at test time, but per-dataset)
        psalt = repr(sorted(ref_params.items())) if ref_params else ""
        ref = cached(
            "ref", ref_path,
            lambda: T.image_to_tensor(
                opt, Image.open(ref_path).convert("RGB"), ref_params),
            salt=psalt)
        if label.shape[-1] != label_ch or ref_label.shape[-1] != label_ch:
            raise ValueError(
                f"label pipeline produced {label.shape[-1]}ch, "
                f"expected {label_ch}ch for {opt.dataset_mode}")
        return {"label": label, "ref": ref, "label_ref": ref_label}

    seen = set()                       # touched only by the watcher side
    pre_q: "queue.Queue" = queue.Queue()
    ready_q: "queue.Queue" = queue.Queue(maxsize=max(4 * b, 8))
    write_q: "queue.Queue" = queue.Queue(maxsize=2)  # <=2 batches in flight
    stop = threading.Event()
    stats_lock = threading.Lock()
    latencies = []
    served = [0]
    inflight = [0]                     # discovered, not yet written/errored
    inflight_lock = threading.Lock()

    def scan_once():
        new = sorted(
            f[: -len(".ref.jpg")] for f in os.listdir(extra_ns.watch_dir)
            if f.endswith(".ref.jpg") and f[: -len(".ref.jpg")] not in seen)
        t = time.perf_counter()
        for r in new:
            seen.add(r)
            with inflight_lock:
                inflight[0] += 1
            pre_q.put((r, t))
        return len(new)

    def fail(r, msg):
        with open(os.path.join(extra_ns.out_dir, r + ".error.txt"),
                  "w") as f:
            f.write(msg + "\n")
        with inflight_lock:
            inflight[0] -= 1

    def preprocessor():
        while not stop.is_set():
            try:
                r, t_disc = pre_q.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                item = load_request(r)
            except Exception as e:  # noqa: BLE001 — a bad request must
                # never kill the worker thread: record it and move on
                # (the old serial loop caught only ValueError/OSError and
                # crashed the whole server on anything else)
                fail(r, f"{type(e).__name__}: {e}")
                continue
            ready_q.put((r, item, t_disc))

    def save_result(img_u8, path_noext):
        # img_u8 arrives quantized from the device (uint8 HWC)
        if extra_ns.out_format == "npy":
            np.save(path_noext + ".npy", img_u8)
        elif extra_ns.out_format == "jpg":
            Image.fromarray(img_u8).save(path_noext + ".jpg", quality=92)
        else:
            Image.fromarray(img_u8).save(
                path_noext + ".png", compress_level=extra_ns.png_level)

    def writer():
        while True:
            got = write_q.get()
            if got is None:
                return
            out_dev, metas = got
            try:
                out = np.asarray(out_dev)      # sync point for this batch
            except Exception as e:             # device-side failure
                for _, r, _ in metas:
                    fail(r, f"device error: {type(e).__name__}: {e}")
                continue
            t_done = time.perf_counter()
            lats = []
            for j, r, t_disc in metas:
                try:
                    save_result(out[j], os.path.join(extra_ns.out_dir, r))
                except Exception as e:         # e.g. disk full mid-save
                    fail(r, f"write error: {type(e).__name__}: {e}")
                    continue
                lats.append((t_done - t_disc) * 1000.0)
                with inflight_lock:
                    inflight[0] -= 1
            if not lats:
                continue
            with stats_lock:
                latencies.extend(lats)
                served[0] += len(lats)
                p50 = float(np.percentile(latencies, 50))
                p99 = float(np.percentile(latencies, 99))
                print(f"served {len(lats)} requests ({served[0]} total); "
                      f"e2e latency p50 {p50:.1f} ms p99 {p99:.1f} ms",
                      flush=True)

    workers = [threading.Thread(target=preprocessor, daemon=True)
               for _ in range(max(1, opt.nThreads))]
    for w in workers:
        w.start()
    wr = threading.Thread(target=writer, daemon=True)
    wr.start()

    window = extra_ns.batch_window_ms / 1000.0
    try:
        last_scan = 0.0
        while True:
            if time.perf_counter() - last_scan >= extra_ns.poll_s \
                    or last_scan == 0.0:
                scan_once()
                last_scan = time.perf_counter()
            if extra_ns.once:
                with inflight_lock:
                    if inflight[0] == 0 and pre_q.empty() \
                            and ready_q.empty():
                        break
            # continuous batching: block for the first ready item, then
            # top up until the batch fills or the window expires. The idle
            # block is capped by --poll_s so discovery latency honors it.
            try:
                first = ready_q.get(
                    timeout=max(0.01, min(0.2, extra_ns.poll_s)))
            except queue.Empty:
                continue
            metas = [first]
            deadline = time.perf_counter() + window
            while len(metas) < b:
                tleft = deadline - time.perf_counter()
                if tleft <= 0 and not extra_ns.once:
                    break
                try:
                    metas.append(ready_q.get(
                        timeout=max(tleft, 0.01) if not extra_ns.once
                        else 0.05))
                except queue.Empty:
                    if extra_ns.once:
                        break
                    continue
            batch = {k: v.copy() for k, v in zero_batch.items()}
            slot_meta = []
            for j, (r, item, t_disc) in enumerate(metas):
                for k in ("label", "ref", "label_ref"):
                    batch[k][j] = item[k]
                slot_meta.append((j, r, t_disc))
            # async dispatch; the writer thread blocks on the result, so
            # the next batch's preprocessing and dispatch overlap compute
            out_dev = step(variables, batch)
            write_q.put((out_dev, slot_meta))
    finally:
        stop.set()
        write_q.put(None)
        wr.join(timeout=30)


if __name__ == "__main__":
    main()
