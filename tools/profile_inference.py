#!/usr/bin/env python
"""Component-level timing + FLOP/MFU breakdown of the flagship inference
path (ade20k 256px batch 6), answering round-1 VERDICT item 2: where do the
~20 ms/image go, and how far from roofline is each stage.

Measures, each as its own jitted program (timings include one dispatch):
  - preprocess_input (one-hot scatter)
  - correspondence net total, and within it: the two domain adaptors,
    the shared residual stack, theta/phi convs, the correlation+warp
  - SPADE generator total
  - full inference for reference
FLOPs come from XLA's compiled cost analysis; MFU assumes the v5e peak
passed via --peak_tflops (197 bf16).

Writes PROFILE.md (markdown) + prints the table.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_DISPATCH_MS = None


def dispatch_overhead_ms():
    """Per-dispatch latency of the (remote axon) runtime, measured with a
    trivial jitted scalar program — subtracted from every per-call timing."""
    global _DISPATCH_MS
    if _DISPATCH_MS is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
        x = jax.device_put(np.ones((8,), np.float32))
        float(f(x))
        times = []
        for _ in range(21):
            t0 = time.perf_counter()
            float(f(x))
            times.append(time.perf_counter() - t0)
        _DISPATCH_MS = float(np.median(times)) * 1000.0
        print(f"(dispatch overhead: {_DISPATCH_MS:.1f} ms/call — "
              "subtracted from all timings)")
    return _DISPATCH_MS


def timeit(fn, args, iters=5, k=6):
    """ms per evaluation: k sequential evaluations inside ONE dispatch (a
    lax.scan whose carry perturbs the next iteration's input, so XLA cannot
    hoist or dedupe), minus the measured dispatch overhead, divided by k.
    Single-call timings are useless here: the axon tunnel adds a noisy
    ~37-44 ms per dispatch."""
    import jax
    import jax.numpy as jnp

    def k_fold(*a):
        def body(c, _):
            scale = 1.0 + c * 1e-30
            pert = list(a)
            pert[-1] = jax.tree.map(
                lambda x: x * scale.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a[-1])
            out = fn(*pert)
            s = sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree.leaves(out))
            return s * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), (), length=k)
        return c

    timed = jax.jit(k_fold)
    float(timed(*args))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(timed(*args))
        times.append(time.perf_counter() - t0)
    per_dispatch = float(np.median(times)) * 1000.0
    return max(per_dispatch - dispatch_overhead_ms(), 0.0) / k


def flops_of(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 peak of the chip (v5e: 197)")
    ap.add_argument("--trace_dir", default="",
                    help="also capture a jax.profiler trace here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cocosnet_tpu import pix2pix as P

    from cocosnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cocosnet_tpu.nn import layers as L

    L.set_compute_dtype(jnp.bfloat16)

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from bench import _opt, _batch

    opt = _opt().replace(batchSize=args.batch)
    nets = P.Pix2PixNets(opt)
    base = _batch(opt)
    batch0 = {k: jax.device_put(v[: args.batch] if v.ndim else v)
              for k, v in base.items()}
    variables = nets.init_all(jax.random.PRNGKey(0), batch0)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}

    rows = []

    def bench_one(name, fn, *fargs):
        jitted = jax.jit(fn)
        ms = timeit(fn, fargs, iters=args.iters)
        fl = flops_of(jitted, *fargs)
        rows.append((name, ms, fl))
        mfu = (fl / (ms / 1e3) / (args.peak_tflops * 1e12) * 100
               if fl == fl and ms > 0 else float("nan"))
        print(f"{name:34s} {ms:8.2f} ms   {fl/1e9 if fl==fl else 0:8.1f} "
              f"GFLOP   {mfu:5.1f}% MFU", flush=True)
        return ms

    # ---- full pipeline pieces -------------------------------------------
    data = jax.jit(lambda b: P.preprocess_input(opt, b))(batch0)
    bench_one("preprocess_input", lambda b: P.preprocess_input(opt, b),
              batch0)

    corr_fn = lambda v, d: nets.corr.apply(
        v["corr"], d["ref_image"], None, d["input_semantics"],
        d["ref_semantics"], train=False)
    corr_out = jax.jit(corr_fn)(variables, data)
    bench_one("correspondence total", corr_fn, variables, data)

    cbn = jax.jit(lambda o, d: P.cbn_input(opt, o["warp_out"],
                                           d["input_semantics"]))(corr_out,
                                                                  data)
    bench_one("generator total",
              lambda v, d, c: nets.gen.apply(v["gen"], d["input_semantics"],
                                             c, train=False),
              variables, data, cbn)

    bench_one("full inference",
              lambda v, d: P.inference(nets, v, d)["fake_image"],
              variables, data)

    # ---- correspondence internals ---------------------------------------
    from cocosnet_tpu.models.generator import AdaptiveFeatureGenerator
    from flax.core import freeze

    corr_params = variables["corr"]

    def subapply(submodule_name, x):
        """Apply one bound submodule of the correspondence net."""
        sub = {c: {submodule_name: corr_params[c][submodule_name]}
               for c in corr_params if submodule_name in corr_params[c]}
        mod = AdaptiveFeatureGenerator(opt,
                                       opt.semantic_nc
                                       if "seg" in submodule_name else 3)
        return mod, sub

    sem = data["input_semantics"]
    ref = data["ref_image"]

    adaptor_seg = AdaptiveFeatureGenerator(opt, opt.semantic_nc)
    seg_vars = {c: corr_params[c]["adaptive_model_seg"]
                for c in corr_params if "adaptive_model_seg" in corr_params[c]}
    bench_one("  adaptor (seg, 151ch)",
              lambda v, s: adaptor_seg.apply(v, s, s, False), seg_vars, sem)
    # same adaptor with the first conv streaming the integer label map
    # instead of the dense one-hot (nn.layers.OneHotLabels -> Pallas
    # gather-conv; the inference() path for ade20k/flickr)
    bench_one("  adaptor (seg, gather-onehot)",
              lambda v, l, s: adaptor_seg.apply(
                  v, L.OneHotLabels(l, opt.semantic_nc, s.dtype), s, False),
              seg_vars, data["input_label"], sem)
    adaptor_img = AdaptiveFeatureGenerator(opt, 3)
    img_vars = {c: corr_params[c]["adaptive_model_img"]
                for c in corr_params if "adaptive_model_img" in corr_params[c]}
    bench_one("  adaptor (img, 3ch)",
              lambda v, r: adaptor_img.apply(v, r, r, False), img_vars, ref)

    # residual stack (4 blocks at 407ch, 64x64)
    from cocosnet_tpu.nn.blocks import ResidualBlock
    from flax import linen as fnn
    ch = 256 + opt.semantic_nc
    feat64 = jax.device_put(
        np.random.RandomState(1).randn(args.batch, 64, 64, ch)
        .astype(np.float32))
    stack = fnn.Sequential([ResidualBlock(ch, name=f"layer_{i}")
                            for i in range(4)])
    stack_vars = jax.jit(stack.init)(jax.random.PRNGKey(0), feat64)
    bench_one("  residual stack (4x407ch)",
              lambda v, x: stack.apply(v, x), stack_vars, feat64)

    # descriptor stage: 1x1 conv + unfold + center + normalize (one side)
    from cocosnet_tpu.ops import image as I
    import sys as _sys
    _EPS = _sys.float_info.epsilon

    def descriptor_stage(x):
        y = x[..., :256]  # stand-in for the 1x1 conv output
        desc = I.unfold_descriptors(y.astype(jnp.float32), 3)
        desc = desc - jnp.mean(desc, axis=-1, keepdims=True)
        nn_ = jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True) + 1e-24)
        return desc / (nn_ + _EPS)
    bench_one("  descriptor unfold+norm (1 side)", descriptor_stage, feat64)

    # correlation block alone (descriptors + attention + warp) at C=2304
    from cocosnet_tpu.ops.correlation import attend_chunked
    rs = np.random.RandomState(0)
    n = opt.corr_n
    q = jax.device_put(rs.randn(args.batch, n, 2304).astype(np.float32))
    k = jax.device_put(rs.randn(args.batch, n, 2304).astype(np.float32))
    v154 = jax.device_put(rs.randn(args.batch, n, 154).astype(np.float32))
    bench_one("  correlation attend (C=2304)",
              lambda a, b, c: attend_chunked(a, b, c, 0.01), q, k, v154)

    # fused 9-shift kernel from raw 256-dim features (replaces descriptor
    # stage + attend entirely)
    from cocosnet_tpu.ops.pallas_shift9 import attend_shift9
    fraw = jax.device_put(rs.randn(args.batch, 64, 64, 256)
                          .astype(np.float32))
    graw = jax.device_put(rs.randn(args.batch, 64, 64, 256)
                          .astype(np.float32))
    bench_one("  attend_shift9 (fused pallas)",
              lambda a, b, c: attend_shift9(a, b, c, 0.01, True),
              fraw, graw, v154)

    # ---- write PROFILE.md ------------------------------------------------
    full_ms = [r for r in rows if r[0] == "full inference"][0][1]
    lines = [
        "# Inference profile — ade20k flagship, 256px, batch "
        f"{args.batch} (v5e)", "",
        f"images/sec/chip at this timing: "
        f"{args.batch / (full_ms / 1e3):.1f}", "",
        "| stage | ms/batch | GFLOP | % of full | MFU @197T peak |",
        "|---|---|---|---|---|",
    ]
    for name, ms, fl in rows:
        mfu = (fl / (ms / 1e3) / (args.peak_tflops * 1e12) * 100
               if fl == fl and ms > 0 else float("nan"))
        lines.append(f"| {name.strip()} | {ms:.2f} | "
                     f"{fl/1e9 if fl==fl else float('nan'):.1f} | "
                     f"{ms/full_ms*100:.0f}% | {mfu:.1f}% |")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out_path}")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.block_until_ready(
                jax.jit(lambda v, d: P.inference(nets, v, d)["fake_image"])(
                    variables, data))
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
