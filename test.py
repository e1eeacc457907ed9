#!/usr/bin/env python
"""Batch inference CLI, flag-compatible with the reference test.py.

Example (reference README.md:45):
  python test.py --name ade20k --dataset_mode ade20k --dataroot ./imgs/ade20k \
      --batchSize 6 --use_attention --maskmix --warp_mask_losstype direct \
      --PONO --PONO_C

Saves either per-image outputs (--save_per_img) or label/ref/fake comparison
grids to output/test/<name>/<i>.png, exactly like reference test.py:27-69.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from cocosnet_tpu.config import parse_options
    opt = parse_options(is_train=False)

    import jax
    from cocosnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    import jax.numpy as jnp_
    from cocosnet_tpu.nn import layers as _L
    if opt.compute_dtype == "bf16":
        _L.set_compute_dtype(jnp_.bfloat16)
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.data.loader import create_dataloader
    from cocosnet_tpu.train.steps import make_inference_step
    from cocosnet_tpu.utils import visuals as V

    dataloader = create_dataloader(opt)
    nets = P.Pix2PixNets(opt)

    # init (shape-build) from the first batch, then overwrite from checkpoint
    first = next(iter(dataloader))
    arrays = {k: v for k, v in first.items() if not isinstance(v, list)}
    variables = nets.init_all(jax.random.PRNGKey(opt.seed), arrays)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}

    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.name)
    loaded = load_any_checkpoint(opt, nets, variables, ckpt_dir)
    if loaded is not None:
        variables = loaded
    elif opt.allow_random_weights:
        print(f"WARNING: no checkpoint found under {ckpt_dir}; "
              "running with random weights (--allow_random_weights)")
    else:
        raise SystemExit(
            f"No checkpoint found under {ckpt_dir} (tried orbax "
            f"state_infer_{opt.which_epoch}, state_{opt.which_epoch}, and "
            f"torch {opt.which_epoch}_net_G/Corr.pth). Pass "
            f"--allow_random_weights to run with random weights anyway.")

    mesh = None
    if opt.mesh_model > 1 or opt.mesh_data > 1:
        # spatial-parallel inference: the correlation's query rows shard over
        # the mesh's `model` axis inside the jitted step (ops/corr_sp.py);
        # the batch shards over `data`
        from cocosnet_tpu import mesh as M
        mesh = M.create_mesh(data=opt.mesh_data, model=opt.mesh_model)
        M.set_global_mesh(mesh)
        print(f"mesh: {mesh}")
        variables = jax.device_put(variables, M.replicated(mesh))

    inference_step = make_inference_step(nets)
    save_root = os.path.join(os.path.dirname(opt.checkpoints_dir), "output")
    if opt.output_dir != "./output":
        save_root = opt.output_dir

    import time
    n_images = 0
    t_start = time.perf_counter()
    for i, batch in enumerate(dataloader):
        print(f"{i} / {len(dataloader)}")
        if i * opt.batchSize >= opt.how_many:
            break
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if mesh is not None:
            from cocosnet_tpu import mesh as M
            arrays = M.shard_batch(mesh, arrays)
        paths = batch["path"]
        # fresh per-batch noise, matching the reference's fresh torch.randn
        # at eval (correspondence.py:262-264)
        out = inference_step(variables, arrays,
                             jax.random.fold_in(jax.random.PRNGKey(opt.seed), i))
        fake = np.asarray(out["fake_image"])
        n_images += fake.shape[0]

        if opt.show_corr and out.get("warp_out") is not None:
            warp = (np.asarray(out["warp_out"]) + 1.0) / 2.0
            for j in range(warp.shape[0]):
                V.save_image(warp[j], os.path.join(
                    save_root, "test", opt.name + "_corr", f"{i}_{j}.png"))

        if opt.save_per_img:
            root = os.path.join(save_root, "test_per_img", opt.name)
            imgs = (fake + 1.0) / 2.0
            for j in range(imgs.shape[0]):
                if opt.dataset_mode == "deepfashion":
                    name = paths[j].split("Dataset/DeepFashion/")[-1] \
                        .replace("/", "_")
                else:
                    name = os.path.basename(paths[j])
                V.save_image(imgs[j], os.path.join(root, name))
        else:
            label = batch["label"]
            if opt.dataset_mode == "deepfashion":
                label_vis = label[..., :3]
            elif opt.dataset_mode == "celebahqedge":
                label_vis = np.repeat(label[..., :1], 3, axis=-1)
            else:
                rgb = V.masktorgb(label[..., 0])
                label_vis = np.transpose(rgb, (0, 2, 3, 1)) / 128.0 - 1.0
            imgs = np.concatenate([label_vis, batch["ref"], fake], axis=0)
            imgs = (imgs + 1.0) / 2.0
            V.save_image_grid(
                imgs, os.path.join(save_root, "test", opt.name, f"{i}.png"),
                nrow=fake.shape[0])
    dt = time.perf_counter() - t_start
    print(f"processed {n_images} images in {dt:.2f}s "
          f"({n_images / dt:.2f} img/s incl. host pipeline)")


def load_any_checkpoint(opt, nets, variables, ckpt_dir):
    """Try, in order: the lean orbax inference state, the full orbax
    TrainState written by train.py (so `train.py; test.py` works with no
    export step), then reference torch .pth files."""
    from cocosnet_tpu.train import checkpoints as C
    label = opt.which_epoch
    # 1) orbax inference export (tools/export_inference.py)
    try:
        restored = C.load_state(opt, variables, f"infer_{label}")
        print(f"loaded orbax checkpoint state_infer_{label}")
        return restored
    except Exception:
        pass
    # 2) full TrainState saved by train.py (state_<label>); EMA preferred
    #    when --use_ema, matching reference test-time loading
    #    (pix2pix_model.py:134-136)
    # (retry: a concurrent train.py may be mid-swap of state_<label> —
    # checkpoints.save_state makes the window two renames wide, but a reader
    # can still land inside it)
    for attempt in range(3):
        if not os.path.isdir(os.path.join(ckpt_dir, f"state_{label}")):
            import time
            time.sleep(1.0)
            continue
        try:
            raw = C.load_raw(opt, label)
            out = C.infer_vars_from_train_state(raw, variables, opt.use_ema)
            print(f"loaded train state_{label}"
                  + (" (EMA weights)" if opt.use_ema else ""))
            return out
        except Exception as e:
            print(f"could not extract inference weights from state_{label} "
                  f"(attempt {attempt + 1}/3): {e}")
            import time
            time.sleep(1.0)
    # 3) torch .pth files saved by the reference
    g_path = os.path.join(ckpt_dir, f"{label}_net_G.pth")
    corr_path = os.path.join(ckpt_dir, f"{label}_net_Corr.pth")
    if opt.use_ema:
        g_ema = os.path.join(ckpt_dir, f"{label}_net_G_ema.pth")
        corr_ema = os.path.join(ckpt_dir, f"{label}_net_netCorr_ema.pth")
        g_path = g_ema if os.path.exists(g_ema) else g_path
        corr_path = corr_ema if os.path.exists(corr_ema) else corr_path
    if os.path.exists(g_path) and os.path.exists(corr_path):
        from tools.convert_weights import convert_generator, convert_corr, merge_into
        print(f"importing torch checkpoints {g_path}, {corr_path}")
        gen_vars = convert_generator(g_path)
        corr_vars = convert_corr(corr_path)
        return {"gen": merge_into(variables["gen"], gen_vars),
                "corr": merge_into(variables["corr"], corr_vars)}
    return None


if __name__ == "__main__":
    main()
