#!/usr/bin/env python
"""Train-step breakdown + roofline of the flagship config (ade20k 256px),
answering round-3 VERDICT item 1c: where do the ~0.42 s/step at batch 8 go,
and what bounds each stage.

Memory discipline (a 16GB v5e): fwd+bwd segments are measured as DONATED
chained steps (the same methodology as bench.bench_train — state in,
state out, buffers reused in place), because an undonated value_and_grad
at batch 8 plus held optimizer state OOMs the chip. Forward-only and
elementwise segments use the k-fold scan timer from profile_inference
(dispatch overhead subtracted); chained segments subtract the measured
per-dispatch overhead once per step so both timers are comparable.

Segments:
  preprocess       one-hot scatter (shared by G and D phases)
  G fwd (losses)   generate_fake + 3 VGG towers + all 11 G loss terms
  G phase step     value_and_grad + adam + EMA on netG+netCorr (donated
                   chain) -> backward_G ~= this - G fwd - G adam - EMA
  D fwd (losses)   discriminate(fake,real) + hinge losses
  D phase step     the D half as a donated chain (make_d_step)
  G adam / D adam  optimizer update + apply alone (zeros grads)
  EMA              shadow update
  one VGG19 tower  (the G phase runs 3: ref, real, fake-in-losses)
  full train_step  the production fused step (pix2pix_trainer.py:52-74)

FLOPs from XLA's compiled cost analysis; MFU against --peak_tflops
(v5e bf16: 197). Writes PROFILE_TRAIN.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--steps", type=int, default=6,
                    help="chained steps per donated-segment measurement")
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--segment", default="all",
                    choices=["all", "g_phase", "d_phase", "full"],
                    help="internal: run ONE donated chained segment and "
                         "print RESULT <ms> — the 'all' parent runs each "
                         "in a fresh subprocess (held fwd-segment buffers "
                         "plus an undonated chain OOM a 16GB chip)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cocosnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from bench import _opt
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.nn import layers as L
    from cocosnet_tpu.ops import pallas_conv
    from cocosnet_tpu.train import state as S
    from cocosnet_tpu.train import steps as ST
    from tools.profile_inference import timeit, flops_of, dispatch_overhead_ms

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
    tx_g, tx_d = S.make_optimizers(opt)
    lr = jnp.asarray(S.lrs_for_epoch(opt, 1))
    key = jax.random.PRNGKey(7)

    def _set_params(vs, params):
        out = dict(vs)
        for k2, p in params.items():
            out[k2] = {**out[k2], "params": p}
        return out

    def g_phase_step(state, bb, l):
        d = P.preprocess_input(opt, bb)
        noise_rng, k2 = jax.random.split(state.noise_rng)
        vs = state.variables

        def loss_fn(gp):
            vars_g = _set_params(vs, gp)
            out, updates = P.generate_fake(nets, vars_g, d, train=True,
                                           rngs={"noise": k2}, mutable=True)
            out["ref_features"] = P.vgg_features(nets, vs["vgg"],
                                                 d["ref_image"])
            out["real_features"] = P.vgg_features(nets, vs["vgg"],
                                                  d["real_image"])
            losses, _ = P.compute_generator_losses(nets, vars_g, d, out,
                                                   vs["disc"],
                                                   mutable_disc=True)
            return sum(jax.tree.leaves(losses))

        loss, grads = jax.value_and_grad(loss_fn)(S.g_params(vs))
        opt_g = optax.tree_utils.tree_set(state.opt_g, learning_rate=l[0])
        up, opt_g = tx_g.update(grads, opt_g, S.g_params(vs))
        new_gp = optax.apply_updates(S.g_params(vs), up)
        vs = _set_params(vs, new_gp)
        ema = S.ema_update(state.ema, new_gp, opt.ema_beta)
        new_state = S.TrainState(step=state.step + 1, variables=vs,
                                 opt_g=opt_g, opt_d=state.opt_d, ema=ema,
                                 noise_rng=noise_rng)
        return new_state, {"loss": loss}

    if args.segment != "all":
        # child mode: ONE donated chained segment in a fresh process
        # (bench.bench_train memory profile: state shares the variables'
        # buffers, donation reuses them in place)
        import json as _json

        extra = ()
        if args.segment == "g_phase":
            step_fn = g_phase_step
        elif args.segment == "d_phase":
            d_step = ST.make_d_step(nets)
            with pallas_conv.training_trace():
                fake = jax.jit(lambda vs, d: P.generate_fake(
                    nets, vs, d, train=True, rngs={"noise": key},
                    mutable=True)[0]["fake_image"])(
                        variables, jax.jit(
                            lambda bb: P.preprocess_input(opt, bb))(batch))
            step_fn = lambda st, bb, l, fk: d_step(st, bb, l, fk)[:2]
            extra = (fake,)
        else:
            full = ST.make_train_step(nets)
            step_fn = lambda st, bb, l: full(st, bb, l)[:2]

        from tools.profile_inference import dispatch_overhead_ms as _dms
        with pallas_conv.training_trace():
            jitted = jax.jit(step_fn, donate_argnums=(0,))
            st = S.create_train_state(opt, variables, jax.random.PRNGKey(0))
            fl = float("nan")
            try:
                cost = jitted.lower(st, batch, lr,
                                    *extra).compile().cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                fl = float(cost.get("flops", float("nan")))
            except Exception:
                pass
            out = jitted(st, batch, lr, *extra)
            st, aux = out[0], out[1]
            float(next(iter(jax.tree.leaves(aux))))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = jitted(st, batch, lr, *extra)
                st, aux = out[0], out[1]
            float(next(iter(jax.tree.leaves(aux))))
            # wall per step, dispatch NOT subtracted: chained donated steps
            # pipeline under the lazy remote runtime (a cheap step's wall
            # can be below one dispatch RTT), so wall/step IS the marginal
            # cost — the same accounting as bench.bench_train
            ms = (time.perf_counter() - t0) / args.steps * 1e3
        print("RESULT " + _json.dumps({"ms": ms, "flops": fl,
                                       "dispatch_ms": _dms()}))
        return

    rows = []

    def record(name, ms, fl):
        rows.append((name, ms, fl))
        mfu = (fl / (ms / 1e3) / (args.peak_tflops * 1e12) * 100
               if fl == fl and ms > 0 else float("nan"))
        print(f"{name:26s} {ms:9.2f} ms  {fl/1e9 if fl==fl else 0:9.1f} "
              f"GFLOP  {mfu:5.1f}% MFU", flush=True)
        return ms

    def bench_one(name, fn, *fargs):
        with pallas_conv.training_trace():
            jitted = jax.jit(fn)
            try:
                ms = timeit(fn, fargs, iters=args.iters, k=args.k)
            except Exception as e:
                print(f"  ({name}: skipped — {type(e).__name__}: "
                      f"{str(e)[:120]})", flush=True)
                rows.append((name, float("nan"), float("nan")))
                return float("nan")
            fl = flops_of(jitted, *fargs)
        return record(name, ms, fl)

    def bench_chain(name, segment):
        """Donated chained-step timing in a FRESH SUBPROCESS (this process
        holds the fwd-segment buffers; together they OOM a 16GB chip)."""
        import json as _json
        import subprocess

        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--segment", segment, "--batch", str(args.batch),
                 "--steps", str(args.steps)],
                capture_output=True, text=True, timeout=2400)
            res = None
            for line in r.stdout.splitlines():
                if line.startswith("RESULT "):
                    res = _json.loads(line[len("RESULT "):])
            if res is None:
                raise RuntimeError((r.stderr or r.stdout)[-400:])
            ms, fl = res["ms"], res["flops"]
        except Exception as e:
            print(f"  ({name}: skipped — {str(e)[:200]})", flush=True)
            rows.append((name, float("nan"), float("nan")))
            return float("nan")
        return record(name, ms, fl)

    data = jax.jit(lambda bb: P.preprocess_input(opt, bb))(batch)
    bench_one("preprocess", lambda bb: P.preprocess_input(opt, bb), batch)

    # ---------------- forward-only segments --------------------------------
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
        return sum(jax.tree.leaves(losses))

    gp0 = S.g_params(variables)
    bench_one("G fwd (losses)", g_loss_fn, gp0, variables, data)

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

    # ---------------- optimizer / EMA alone (zeros grads — same FLOPs) -----
    zg = jax.tree.map(jnp.zeros_like, gp0)

    def g_adam(grads, ost, gp):
        up, ost2 = tx_g.update(grads, ost, gp)
        return optax.apply_updates(gp, up)

    st_tmp = S.create_train_state(opt, variables, jax.random.PRNGKey(0))
    bench_one("G adam", g_adam, zg, st_tmp.opt_g, gp0)
    zd = jax.tree.map(jnp.zeros_like, dp0)

    def d_adam(grads, ost, dp):
        up, ost2 = tx_d.update(grads, ost, dp)
        return optax.apply_updates(dp, up)

    bench_one("D adam", d_adam, zd, st_tmp.opt_d, dp0)
    bench_one("EMA update",
              lambda ema, gp: S.ema_update(ema, gp, opt.ema_beta),
              st_tmp.ema, gp0)
    del st_tmp, zg, zd

    bench_one("  one VGG19 tower",
              lambda vs, d: P.vgg_features(nets, vs["vgg"], d["real_image"]),
              variables, data)

    # ---------------- donated chained segments (fresh subprocesses) --------
    bench_chain("G phase (bwd+adam+EMA)", "g_phase")
    bench_chain("D phase (bwd+adam)", "d_phase")
    full_ms = bench_chain("full train_step", "full")

    ips = args.batch / (full_ms / 1e3)
    print(f"\n=> {full_ms:.1f} ms/step (dispatch excluded), {ips:.2f} "
          f"img/s/chip at batch {args.batch}")

    lines = [
        f"# Train-step profile — ade20k flagship, 256px, batch {args.batch} "
        "(v5e)", "",
        f"{full_ms:.1f} ms/step (per-dispatch overhead excluded) = "
        f"{ips:.2f} img/s/chip. Forward/optimizer segments are standalone "
        "jitted programs (k-fold scan timer); fwd+bwd segments are donated "
        "chained steps (bench.bench_train methodology). The fused "
        "production step overlaps/fuses across segment boundaries, so "
        "parts sum above the whole.", "",
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
