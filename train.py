#!/usr/bin/env python
"""Training CLI, flag-compatible with the reference train.py.

Example (reference README.md:83):
  python train.py --name ade20k --dataset_mode ade20k --dataroot <path> \
      --niter 100 --niter_decay 100 --use_attention --maskmix \
      --warp_mask_losstype direct --weight_mask 100.0 --PONO --PONO_C \
      --batchSize 32 --vgg_normal_correct

Structure mirrors reference train.py:27-122: per-iteration G step then D
step (fused into one jitted program over the device mesh), periodic loss
printing to loss_log.txt, visual grids every --display_freq, `latest` +
per-epoch checkpoints, linear LR decay after --niter epochs.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from cocosnet_tpu.config import parse_options, save_options
    opt = parse_options(is_train=True)

    import jax
    from cocosnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from cocosnet_tpu import mesh as M0
    multiproc = M0.maybe_init_distributed(opt)  # before any device query
    is_main = jax.process_index() == 0
    if multiproc:
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    if is_main:
        save_options(opt,
                     os.path.join(opt.checkpoints_dir, opt.name, "opt.json"))
    import jax.numpy as jnp

    import jax.numpy as jnp_
    from cocosnet_tpu.nn import layers as _L
    if opt.compute_dtype == "bf16":
        _L.set_compute_dtype(jnp_.bfloat16)
    from cocosnet_tpu import mesh as M
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.data.loader import create_dataloader, prefetch_to_device
    from cocosnet_tpu.train import checkpoints as C
    from cocosnet_tpu.train import state as S
    from cocosnet_tpu.train import steps as ST
    from cocosnet_tpu.utils.iter_counter import StepEvents, TrainProgress
    from cocosnet_tpu.utils.logging import print_current_errors
    from cocosnet_tpu.utils import visuals as V

    dataloader = create_dataloader(opt)
    progress = TrainProgress(opt, len(dataloader.dataset))

    mesh = M.create_mesh(data=opt.mesh_data, model=opt.mesh_model)
    M.set_global_mesh(mesh)  # corr_sp.attend_sp resolves it at trace time
    print(f"mesh: {mesh}")

    nets = P.Pix2PixNets(opt)
    first = next(iter(dataloader))
    arrays = {k: v for k, v in first.items() if not isinstance(v, list)}
    variables = nets.init_all(jax.random.PRNGKey(opt.seed), arrays)

    # pretrained VGG for the perceptual losses
    if os.path.exists(opt.vgg_weights):
        from tools.convert_weights import load_vgg_npz
        variables["vgg"] = load_vgg_npz(opt.vgg_weights, variables["vgg"])
        print(f"loaded VGG weights from {opt.vgg_weights}")
    elif os.path.exists(opt.vgg_weights.replace(".npz", ".pth")):
        from tools.convert_weights import convert_vgg
        variables["vgg"] = convert_vgg(
            opt.vgg_weights.replace(".npz", ".pth"), variables["vgg"])
        print("imported VGG weights from torch checkpoint")
    else:
        print(f"WARNING: VGG weights not found at {opt.vgg_weights}; "
              "perceptual losses use random features")

    state = S.create_train_state(opt, variables, jax.random.PRNGKey(opt.seed))
    if opt.continue_train:
        try:
            state = C.load_state(opt, state, opt.which_epoch)
            if jax.process_count() == 1:
                # orbax restores COMMITTED to device 0; a fresh-init state is
                # uncommitted (jit places it next to the sharded batch). Under
                # a >1-device mesh the committed placement collides with the
                # data-sharded batch ("incompatible devices") — re-place the
                # restored state replicated over the mesh, which is exactly
                # the layout jit resolves for the fresh path.
                state = jax.device_put(state, M.replicated(mesh))
            print(f"resumed train state from {opt.which_epoch}")
        except Exception as e:
            print(f"could not resume ({e}); starting fresh")

    # the --noise_for_mask switch at epoch > mask_epoch changes the traced
    # graph (correspondence.py:262-264), so the step is (re)built per phase
    step_cache = {}

    def get_steps(epoch):
        noise_phase = bool(opt.noise_for_mask and epoch > opt.mask_epoch)
        if noise_phase not in step_cache:
            nets_e = P.Pix2PixNets(
                opt.replace(epoch=opt.mask_epoch + 1 if noise_phase else 1))
            ts = jax.jit(ST.make_train_step(nets_e), donate_argnums=(0,))
            ds = (jax.jit(ST.make_d_step(nets_e), donate_argnums=(0,))
                  if opt.D_steps_per_G > 1 else None)
            step_cache[noise_phase] = (ts, ds)
        return step_cache[noise_phase]

    train_step, d_only_step = get_steps(progress.start_epoch)
    last_fake = None

    # --steps_per_dispatch > 1: K steps fused in one lax.scan program
    # (train/steps.py:make_multi_train_step) — one dispatch + one NaN-probe
    # sync per K iterations. Losses still log PER STEP from the stacked
    # metrics; visuals come from the last step of a chunk. Incompatible
    # with the D_steps_per_G>1 schedule (per-step branching) — falls back.
    spd = opt.steps_per_dispatch
    if spd > 1 and opt.D_steps_per_G > 1:
        print("steps_per_dispatch > 1 is unsupported with D_steps_per_G > 1;"
              " running per-step dispatch")
        spd = 1
    multi_cache = {}

    def get_multi_step(epoch):
        noise_phase = bool(opt.noise_for_mask and epoch > opt.mask_epoch)
        if noise_phase not in multi_cache:
            nets_e = P.Pix2PixNets(
                opt.replace(epoch=opt.mask_epoch + 1 if noise_phase else 1))
            multi_cache[noise_phase] = jax.jit(
                ST.make_multi_train_step(nets_e), donate_argnums=(0,))
        return multi_cache[noise_phase]

    from cocosnet_tpu.utils.profiling import Throughput, maybe_trace
    throughput = Throughput()

    save_root = os.path.join(os.path.dirname(opt.checkpoints_dir), "output")
    if opt.output_dir != "./output":
        save_root = opt.output_dir

    def nan_bail(epoch):
        C.save_state(opt, state, "nan_debug")
        raise FloatingPointError(
            f"loss went NaN at epoch {epoch}, iter "
            f"{progress.epoch_iter} — state saved as "
            f"'nan_debug' for inspection; rerun with "
            f"--compute_dtype f32 and/or a lower --lr")

    def handle_events(events, epoch, metrics_host, visuals, batch):
        # metrics_host: {name: float} for THIS step (row j of a chunk)
        if events.print_losses and is_main:
            metrics_np = dict(metrics_host)
            metrics_np["img/s"] = throughput.step(opt.batchSize)
            print_current_errors(opt, epoch, progress.epoch_iter,
                                 metrics_np, progress.time_per_img)
        if events.display_visuals and is_main and visuals:
            try:
                _save_visuals(opt, batch, visuals, epoch,
                              progress.images_seen, save_root, V)
            except OSError as err:
                print(err)
        if events.save_latest:
            if is_main:
                print(f"saving the latest model (epoch {epoch}, "
                      f"total_steps {progress.images_seen})")
            C.save_state(opt, state, "latest")  # collective on multi-host
            if is_main:
                progress.save_record()

    for epoch in progress.epochs():
        progress.begin_epoch(epoch)
        train_step, d_only_step = get_steps(epoch)
        multi_step = get_multi_step(epoch) if spd > 1 else None
        lr = jnp.asarray(S.lrs_for_epoch(opt, epoch))  # (lr_G, lr_D)
        pending = []  # (batch, paths) awaiting a full steps_per_dispatch chunk

        def run_chunk(epoch, chunk_i):
            nonlocal state, last_fake, pending
            batches = [b for b, _ in pending]
            last_batch = pending[-1][0]
            pending = []
            stacked = {k: jnp.stack([b[k] for b in batches])
                       for k in batches[0]}
            trace_this = bool(opt.profile_dir) and epoch == 1 and chunk_i == 2
            with maybe_trace(opt.profile_dir, trace_this):
                state, metrics_k, visuals = multi_step(state, stacked, lr)
            last_fake = visuals["fake_image"]
            # one host sync per chunk: fetch the stacked per-step metrics
            mh = {k: np.asarray(v) for k, v in metrics_k.items()}
            if np.isnan(next(iter(mh.values()))).any():
                nan_bail(epoch)
            # save_latest is deferred to the chunk boundary: `state` already
            # holds the post-chunk value, so a mid-chunk save would pair it
            # with a mid-chunk iter.txt count and the resume would replay
            # steps the checkpoint already contains
            want_save = False
            for j in range(len(batches)):
                events = progress.step()
                want_save = want_save or events.save_latest
                handle_events(dataclasses.replace(events, save_latest=False),
                              epoch,
                              {k: float(v[j]) for k, v in mh.items()},
                              visuals, last_batch)
            if want_save:
                handle_events(StepEvents(save_latest=True), epoch, {},
                              visuals, last_batch)

        for i, (batch, paths) in enumerate(
                prefetch_to_device(iter(dataloader), mesh)):
            if multi_step is not None:
                pending.append((batch, paths))
                if len(pending) == spd:
                    run_chunk(epoch, i // spd)
                continue
            events = progress.step()
            trace_this = bool(opt.profile_dir) and epoch == 1 and i == 2
            with maybe_trace(opt.profile_dir, trace_this):
                if d_only_step is not None and i % opt.D_steps_per_G != 0 \
                        and last_fake is not None:
                    # D-only iteration (reference train.py:54-58)
                    state, metrics = d_only_step(state, batch, lr, last_fake)
                    visuals = {}
                else:
                    state, metrics, visuals = train_step(state, batch, lr)
                    last_fake = visuals["fake_image"]
            # force materialization each step: a cheap scalar fetch keeps the
            # remote runtime's lazy execution chain short (multi-hundred-step
            # unmaterialized chains have produced corrupted replays) and is
            # the standard loss-logging fetch on any backend
            probe = float(next(iter(metrics.values())))
            if probe != probe:  # NaN guard (free: probe is fetched anyway)
                nan_bail(epoch)
            handle_events(events, epoch,
                          {k: float(v) for k, v in metrics.items()},
                          visuals, batch)
        # epoch tail shorter than a chunk: run the leftovers per-step
        for batch, paths in pending:
            events = progress.step()
            state, metrics, visuals = train_step(state, batch, lr)
            last_fake = visuals["fake_image"]
            probe = float(next(iter(metrics.values())))
            if probe != probe:
                nan_bail(epoch)
            handle_events(events, epoch,
                          {k: float(v) for k, v in metrics.items()},
                          visuals, batch)
        pending = []
        progress.end_epoch(verbose=is_main)
        if epoch % opt.save_epoch_freq == 0 or \
                epoch == progress.final_epoch:
            if is_main:
                print(f"saving the model at the end of epoch {epoch}, "
                      f"iters {progress.images_seen}")
            C.save_state(opt, state, "latest")
            C.save_state(opt, state, str(epoch))

    if is_main:
        print("Training was successfully finished.")


def _np_local(x):
    """Local-process view of a (possibly multi-host sharded) jax.Array."""
    import numpy as np
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards])
    return np.asarray(x)


def _save_visuals(opt, batch, visuals, epoch, step, save_root, V):
    import numpy as np
    imgs_dir = os.path.join(save_root, "training", opt.name)
    fake = _np_local(visuals["fake_image"])
    real = np.asarray(batch["image"])
    ref = np.asarray(batch["ref"])
    label = np.asarray(batch["label"])
    if opt.dataset_mode == "deepfashion":
        label_vis = label[..., :3]
    elif opt.dataset_mode == "celebahqedge":
        label_vis = np.repeat(label[..., :1], 3, axis=-1)
    else:
        rgb = V.masktorgb(label[..., 0])
        label_vis = np.transpose(rgb, (0, 2, 3, 1)) / 128.0 - 1.0
    rows = [label_vis, ref]
    if visuals.get("warp_out") is not None:
        rows.append(_np_local(visuals["warp_out"]))
    rows += [fake, real]
    imgs = (np.concatenate(rows, axis=0) + 1.0) / 2.0
    V.save_image_grid(
        imgs, os.path.join(imgs_dir, f"{epoch}_{step}.png"),
        nrow=fake.shape[0])


if __name__ == "__main__":
    main()
