#!/usr/bin/env python
"""Per-layer A/B of the Pallas dW kernel vs XLA's weight-gradient conv.

Round-4 PROFILE_TRAIN.md pins the training bound on the G backward (~39%
MFU) and names dL/dW — XLA lowers it as a patch correlation contracting
over the batch dim. This tool:

  1. captures every 3x3 stride-1 conv shape the G training step actually
     runs (monkeypatched nn.layers.conv2d under jax.eval_shape — no
     compute, exact shapes including reflect-pad variants);
  2. times, per unique shape, XLA's dW (jax.grad of the same conv w.r.t.
     the kernel — the op AD emits in the real step) against
     ops.pallas_conv.conv3x3_dw, with the k-fold scan timer;
  3. prints the table that decides conv3x3_dw_supported's gate.

Run on the real chip. Matches the training hot loop of
/root/reference/trainers/pix2pix_trainer.py:52-62.
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture_shapes(batch: int):
    """-> Counter{(B,H,W,Cin,Cout,reflect): count} of 3x3 s1 convs in the
    G loss forward (the backward runs one dW per occurrence)."""
    import jax
    from bench import _opt
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.nn import layers as L
    from cocosnet_tpu.train import state as S

    opt = _opt().replace(isTrain=True, batchSize=batch,
                         use_ema=True, weight_mask=100.0)
    nets = P.Pix2PixNets(opt)
    rs = np.random.RandomState(0)
    h = opt.crop_size
    base = {
        "label": rs.randint(0, opt.semantic_nc,
                            (batch, h, h, 1)).astype(np.float32),
        "image": (rs.rand(batch, h, h, 3).astype(np.float32) * 2 - 1),
        "ref": (rs.rand(batch, h, h, 3).astype(np.float32) * 2 - 1),
        "label_ref": rs.randint(0, opt.semantic_nc,
                                (batch, h, h, 1)).astype(np.float32),
        "self_ref": np.ones((batch,), np.float32),
    }
    variables = nets.init_all(jax.random.PRNGKey(0), base)

    shapes = collections.Counter()
    orig = L.conv2d
    orig_vgg = P.vgg_features
    in_vgg = [False]

    def vgg_silent(*a, **kw):
        # frozen VGG: its convs get no dL/dW in the real step — exclude
        in_vgg[0] = True
        try:
            return orig_vgg(*a, **kw)
        finally:
            in_vgg[0] = False

    def recorder(x, kernel, bias=None, *, stride=1, padding=0, dilation=1,
                 compute_dtype=None, reflect=False, want_stats=False):
        if (not in_vgg[0] and tuple(kernel.shape[:2]) == (3, 3) and stride == 1
                and dilation == 1 and (reflect or padding == 1)):
            shapes[(x.shape[0], x.shape[1], x.shape[2], x.shape[3],
                    kernel.shape[3], reflect)] += 1
        return orig(x, kernel, bias, stride=stride, padding=padding,
                    dilation=dilation, compute_dtype=compute_dtype,
                    reflect=reflect, want_stats=want_stats)

    def g_loss(vs, bb, key):
        d = P.preprocess_input(opt, bb)
        out, _ = P.generate_fake(nets, vs, d, train=True,
                                 rngs={"noise": key}, mutable=True)
        out["ref_features"] = P.vgg_features(nets, vs["vgg"], d["ref_image"])
        out["real_features"] = P.vgg_features(nets, vs["vgg"],
                                              d["real_image"])
        losses, _ = P.compute_generator_losses(nets, vs, d, out, vs["disc"],
                                               mutable_disc=True)
        return sum(jax.tree.leaves(losses))

    L.conv2d = recorder
    P.vgg_features = vgg_silent
    try:
        jax.eval_shape(g_loss, variables, base, jax.random.PRNGKey(7))
    finally:
        L.conv2d = orig
        P.vgg_features = orig_vgg
    return shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--trainable_only", action="store_true", default=True,
                    help="skip frozen-VGG shapes (no dW in the real step)")
    args = ap.parse_args()

    # measure every FEASIBLE shape, not just the committed winners table —
    # this tool is what produces that table
    os.environ.setdefault("COCOSNET_PALLAS_DW", "all")

    import jax
    import jax.numpy as jnp
    from cocosnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cocosnet_tpu.nn import layers as L
    from cocosnet_tpu.ops.pallas_conv import conv3x3_dw, conv3x3_dw_supported
    from tools.profile_inference import timeit

    L.set_compute_dtype(jnp.bfloat16)
    shapes = capture_shapes(args.batch)
    # Frozen-VGG shapes: the 3 VGG towers run 3ch->64..512 convs on the
    # 256/128/64/32/16 pyramid but their params get NO gradient. They are
    # recognizable as the exact torchvision VGG19 ladder on 3-channel
    # input at crop size; every trainable conv in this model has Cin>=64
    # with Cout in the SPADE/adaptor sets. Rather than pattern-match,
    # re-capture with VGG excluded is overkill — the heuristic below flags
    # rows; the table prints everything and marks gated rows.

    rows = []
    print(f"{'B,H,W,Cin->Cout,refl':>34s} {'count':>5s} {'xla ms':>8s} "
          f"{'pallas ms':>9s} {'speedup':>7s} {'xla MFU':>7s} "
          f"{'pl MFU':>7s} gate")
    for (b, h, w, ci, co, refl), cnt in sorted(shapes.items(),
                                               key=lambda kv: -kv[1]):
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(b, h, w, ci).astype(np.float32)
                        ).astype(jnp.bfloat16)
        g = jnp.asarray(rs.randn(b, h, w, co).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k0 = jnp.asarray((rs.randn(3, 3, ci, co) * 0.05).astype(np.float32)
                         ).astype(jnp.bfloat16)

        # NOTE the argument order: timeit's k-fold scan perturbs the LAST
        # argument per iteration. dW is LINEAR in g (dW = corr(x, g)), so a
        # perturbed g factors out and XLA hoists the whole correlation out
        # of the scan (measured: "0.009 ms", 2211% MFU). Perturbing x keeps
        # the conv operand iteration-variant — nothing can hoist.
        def xla_dw(k0, g, x):
            def f(kk):
                if refl:
                    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                 mode="reflect")
                    y = jax.lax.conv_general_dilated(
                        xp, kk, (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                else:
                    y = jax.lax.conv_general_dilated(
                        x, kk, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.vdot(y.astype(jnp.float32), g.astype(jnp.float32))
            return jax.grad(f)(kk := k0)

        supported = conv3x3_dw_supported((b, h, w, ci), (3, 3, ci, co),
                                         reflect=refl)
        try:
            ms_x = timeit(xla_dw, (k0, g, x), iters=args.iters, k=args.k)
        except Exception as e:
            print(f"  xla timing failed for {(b,h,w,ci,co)}: {e}")
            continue
        ms_p = float("nan")
        if supported:
            try:
                ms_p = timeit(lambda g, x: conv3x3_dw(x, g, reflect=refl),
                              (g, x), iters=args.iters, k=args.k)
            except Exception as e:
                print(f"  pallas timing failed for {(b,h,w,ci,co)}: "
                      f"{type(e).__name__} {str(e)[:100]}")
        fl = 2 * b * h * w * 9 * ci * co
        ms_x = max(ms_x, 1e-6)
        mfu_x = fl / (ms_x / 1e3) / (args.peak_tflops * 1e12) * 100
        mfu_p = (fl / (ms_p / 1e3) / (args.peak_tflops * 1e12) * 100
                 if ms_p == ms_p else float("nan"))
        sp = ms_x / ms_p if ms_p == ms_p else float("nan")
        rows.append(dict(shape=(b, h, w, ci, co, refl), count=cnt,
                         xla_ms=ms_x, pallas_ms=ms_p, speedup=sp,
                         xla_mfu=mfu_x, pallas_mfu=mfu_p, gated=supported))
        print(f"{f'{b},{h},{w},{ci}->{co},{int(refl)}':>34s} {cnt:>5d} "
              f"{ms_x:>8.3f} {ms_p:>9.3f} {sp:>7.2f} {mfu_x:>6.1f}% "
              f"{mfu_p:>6.1f}% {'on' if supported else 'off'}")

    tot_x = sum(r["xla_ms"] * r["count"] for r in rows)
    tot_b = sum((min(r["pallas_ms"], r["xla_ms"])
                 if r["pallas_ms"] == r["pallas_ms"] else r["xla_ms"])
                * r["count"] for r in rows)
    print(f"\nTotal dW time per G backward: XLA {tot_x:.1f} ms -> best-of "
          f"{tot_b:.1f} ms ({tot_x / max(tot_b, 1e-9):.2f}x)")
    import json
    print("RESULT " + json.dumps(rows, default=str))


if __name__ == "__main__":
    main()
