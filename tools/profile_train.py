#!/usr/bin/env python
"""Train-step breakdown + roofline of the flagship config (ade20k 256px),
answering round-3 VERDICT item 1c: where do the ~0.42 s/step at batch 8 go,
and what bounds each stage.

Segments, each timed as its own jitted program (methodology identical to
tools/profile_inference.py: k-fold lax.scan per dispatch, measured dispatch
overhead subtracted):

  preprocess        one-hot scatter (shared by G and D phases)
  G fwd (losses)    generate_fake + 3 VGG towers + all G loss terms
  G fwd+bwd         value_and_grad of the same (the backward's cost is the
                    difference vs the row above)
  G adam            optimizer update + apply alone
  D fwd (losses)    discriminate(fake,real) + hinge losses
  D fwd+bwd         value_and_grad of the same
  D adam            optimizer update + apply
  EMA               shadow update
  full train_step   the production fused step (reference schedule:
                    pix2pix_trainer.py:52-74 G then D per iteration)

FLOPs from XLA's compiled cost analysis; MFU against --peak_tflops
(v5e bf16: 197). Writes PROFILE_TRAIN.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import _opt
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.nn import layers as L
    from cocosnet_tpu.train import state as S
    from cocosnet_tpu.train import steps as ST
    from tools.profile_inference import timeit, flops_of

    L.set_compute_dtype(jnp.bfloat16)
    opt = _opt().replace(isTrain=True, batchSize=args.batch,
                         use_ema=True, weight_mask=100.0)
    nets = P.Pix2PixNets(opt)
    rs = np.random.RandomState(0)
    h = opt.crop_size
    b = args.batch
    base = {
        "label": rs.randint(0, opt.semantic_nc, (b, h, h, 1)).astype(np.float32),
        "image": (rs.rand(b, h, h, 3).astype(np.float32) * 2 - 1),
        "ref": (rs.rand(b, h, h, 3).astype(np.float32) * 2 - 1),
        "label_ref": rs.randint(0, opt.semantic_nc,
                                (b, h, h, 1)).astype(np.float32),
        "self_ref": np.ones((b,), np.float32),
    }
    batch = {k: jax.device_put(v) for k, v in base.items()}
    variables = nets.init_all(jax.random.PRNGKey(0), batch)
    state = S.create_train_state(opt, variables, jax.random.PRNGKey(0))
    tx_g, tx_d = S.make_optimizers(opt)
    lr = jnp.asarray(S.lrs_for_epoch(opt, 1))
    key = jax.random.PRNGKey(7)

    from cocosnet_tpu.ops import pallas_conv

    rows = []

    def bench_one(name, fn, *fargs):
        with pallas_conv.training_trace():
            jitted = jax.jit(fn)
            try:
                ms = timeit(fn, fargs, iters=args.iters, k=args.k)
            except Exception as e:  # HBM-heavy segments can OOM inside the
                print(f"  ({name}: k={args.k} fold OOM'd, retrying k=1: "
                      f"{type(e).__name__})", flush=True)
                try:
                    ms = timeit(fn, fargs, iters=args.iters, k=1)
                except Exception as e2:
                    print(f"  ({name}: skipped — {type(e2).__name__})",
                          flush=True)
                    rows.append((name, float("nan"), float("nan")))
                    return float("nan")
            fl = flops_of(jitted, *fargs)
        rows.append((name, ms, fl))
        mfu = (fl / (ms / 1e3) / (args.peak_tflops * 1e12) * 100
               if fl == fl and ms > 0 else float("nan"))
        print(f"{name:26s} {ms:9.2f} ms  {fl/1e9 if fl==fl else 0:9.1f} "
              f"GFLOP  {mfu:5.1f}% MFU", flush=True)
        return ms

    data = jax.jit(lambda bb: P.preprocess_input(opt, bb))(batch)
    bench_one("preprocess", lambda bb: P.preprocess_input(opt, bb), batch)

    # ---------------- G segments (mirrors steps.make_train_step) ----------
    def _set_params(vs, params):
        out = dict(vs)
        for k2, p in params.items():
            out[k2] = {**out[k2], "params": p}
        return out

    def g_loss_fn(gp, vs, d):
        vars_g = _set_params(vs, gp)
        out, updates = P.generate_fake(nets, vars_g, d, train=True,
                                       rngs={"noise": key}, mutable=True)
        out["ref_features"] = P.vgg_features(nets, vs["vgg"], d["ref_image"])
        out["real_features"] = P.vgg_features(nets, vs["vgg"], d["real_image"])
        losses, _ = P.compute_generator_losses(nets, vars_g, d, out,
                                               vs["disc"], mutable_disc=True)
        return sum(jax.tree.leaves(losses)), losses

    gp0 = S.g_params(variables)
    bench_one("G fwd (losses)",
              lambda gp, vs, d: g_loss_fn(gp, vs, d)[0],
              gp0, variables, data)

    g_vag = lambda gp, vs, d: jax.value_and_grad(
        lambda p: g_loss_fn(p, vs, d)[0])(gp)
    with pallas_conv.training_trace():  # grad warm-ups must gate like steps
        _, g_grads = jax.jit(g_vag)(gp0, variables, data)
    bench_one("G fwd+bwd", g_vag, gp0, variables, data)

    def g_adam(grads, ost, gp):
        up, ost2 = tx_g.update(grads, ost, gp)
        return optax.apply_updates(gp, up)
    bench_one("G adam", g_adam, g_grads, state.opt_g, gp0)

    # ---------------- D segments ------------------------------------------
    with pallas_conv.training_trace():
        fake = jax.jit(lambda vs, d: P.generate_fake(
            nets, vs, d, train=True, rngs={"noise": key},
            mutable=True)[0]["fake_image"])(variables, data)

    def d_loss_fn(dp, vs, d, fk):
        vars_d = _set_params(vs, dp)
        pred_fake, pred_real, _, _ = P.discriminate(
            nets, vars_d["disc"], d["input_semantics"],
            jax.lax.stop_gradient(fk), d["real_image"], train=True,
            mutable=True)
        from cocosnet_tpu.losses.gan import gan_loss
        return (gan_loss(pred_fake, False, True, opt.gan_mode)
                + gan_loss(pred_real, True, True, opt.gan_mode)) \
            * opt.weight_gan

    dp0 = S.d_params(variables)
    bench_one("D fwd (losses)", d_loss_fn, dp0, variables, data, fake)
    d_vag = lambda dp, vs, d, fk: jax.value_and_grad(
        lambda p: d_loss_fn(p, vs, d, fk))(dp)
    with pallas_conv.training_trace():
        _, d_grads = jax.jit(d_vag)(dp0, variables, data, fake)
    bench_one("D fwd+bwd", d_vag, dp0, variables, data, fake)

    def d_adam(grads, ost, dp):
        up, ost2 = tx_d.update(grads, ost, dp)
        return optax.apply_updates(dp, up)
    bench_one("D adam", d_adam, d_grads, state.opt_d, dp0)

    bench_one("EMA update",
              lambda ema, gp: S.ema_update(ema, gp, opt.ema_beta),
              state.ema, gp0)

    # one VGG tower alone (the G phase runs 3: ref, real, fake-in-losses)
    bench_one("  one VGG19 tower",
              lambda vs, d: P.vgg_features(nets, vs["vgg"], d["real_image"]),
              variables, data)

    # ---------------- full fused step --------------------------------------
    step = ST.make_train_step(nets)
    full_ms = bench_one("full train_step",
                        lambda st, bb, l: step(st, bb, l)[1], state, batch, lr)

    ips = args.batch / (full_ms / 1e3)
    print(f"\n=> {full_ms:.1f} ms/step, {ips:.2f} img/s/chip at batch "
          f"{args.batch}")

    lines = [
        f"# Train-step profile — ade20k flagship, 256px, batch {args.batch} "
        "(v5e)", "",
        f"{full_ms:.1f} ms/step = {ips:.2f} img/s/chip. Segments timed as "
        "standalone jitted programs (k-fold scan, dispatch overhead "
        "subtracted); the fused production step overlaps/fuses across "
        "segment boundaries, so parts sum above the whole.", "",
        "| segment | ms | GFLOP | MFU @197T |",
        "|---|---|---|---|",
    ]
    for name, ms, fl in rows:
        mfu = (fl / (ms / 1e3) / (args.peak_tflops * 1e12) * 100
               if fl == fl and ms > 0 else float("nan"))
        lines.append(f"| {name.strip()} | {ms:.2f} | "
                     f"{fl/1e9 if fl==fl else float('nan'):.1f} | "
                     f"{mfu:.1f}% |")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_TRAIN.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
