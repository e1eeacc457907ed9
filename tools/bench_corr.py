#!/usr/bin/env python
"""A/B benchmark + accuracy audit of the correlation paths on real TPU.

Compares, at the flagship shape (256px, down=4 -> N=4096, match_kernel=3 ->
2304-dim descriptors):
  - attend_chunked      : XLA streaming over 2304-dim descriptors (round-1
                          production path)
  - attend_pallas_bigc  : round-1 fused Pallas kernel for large descriptors
  - attend_unfold       : 9-shift decomposition (ops/corr_shift.py)
for forward and forward+backward, plus max-abs error vs an f32 HIGHEST
oracle. Writes a markdown table to stdout (commit into PERF.md).

Usage: python tools/bench_corr.py [--batch 6] [--iters 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


_DISPATCH_MS = None


def _dispatch_ms():
    global _DISPATCH_MS
    if _DISPATCH_MS is None:
        import jax
        import jax.numpy as jnp
        import numpy as np
        f = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
        x = jax.device_put(np.ones((8,), np.float32))
        float(f(x))
        ts = []
        for _ in range(15):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _DISPATCH_MS = float(np.median(ts)) * 1000.0
    return _DISPATCH_MS


def timeit(fn, *args, iters=4, k=6):
    """ms per evaluation: k sequential evaluations per dispatch via lax.scan
    (carry-perturbed input defeats hoisting), dispatch overhead subtracted.
    The remote axon tunnel costs a noisy ~30-45 ms per dispatch, so
    single-call timings are useless."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def k_fold(*a):
        def body(c, _):
            pert = list(a)
            pert[-1] = a[-1] * (1.0 + c * 1e-30)
            return fn(*pert) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), (), length=k)
        return c

    timed = jax.jit(k_fold)
    float(timed(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(timed(*args))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) * 1000.0 - _dispatch_ms(), 0.0) / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--d", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--pono_c", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cocosnet_tpu.ops import image as I
    from cocosnet_tpu.ops.correlation import attend_chunked, attend_reference
    from cocosnet_tpu.ops.corr_shift import attend_unfold

    b, h, w, c, d = args.batch, args.hw, args.hw, args.c, args.d
    n = h * w
    tau = 0.01
    rs = np.random.RandomState(0)
    # realistic magnitudes: conv outputs are zero-mean-ish unit-scale
    f = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    g = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    v = jnp.asarray(rs.randn(b, n, d).astype(np.float32))

    eps = sys.float_info.epsilon

    def descriptor(y, pono_c=True):
        desc = I.unfold_descriptors(y.astype(jnp.float32), 3)
        if pono_c:
            desc = desc - jnp.mean(desc, axis=-1, keepdims=True)
        else:
            desc = desc - jnp.mean(desc, axis=1, keepdims=True)
        nn = jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True) + 1e-24)
        return desc / (nn + eps)

    q = jax.jit(descriptor)(f)
    k = jax.jit(descriptor)(g)

    # oracle: HIGHEST-precision dense reference in f32 (small batch slice)
    import functools
    oracle = None
    try:
        @jax.jit
        def _oracle(q1, k1, v1):
            s = jnp.einsum("bnc,bmc->bnm", q1, k1,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) / tau
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bnm,bmd->bnd", p, v1,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        oracle = np.asarray(_oracle(q[:1], k[:1], v[:1]))
    except Exception as e:
        print(f"(oracle skipped: {e})")

    rows = []

    def audit(name, fn, *fargs, from_features=False):
        out = np.asarray(fn(*fargs))
        err = (np.max(np.abs(out[:1] - oracle))
               if oracle is not None else float("nan"))
        fwd = timeit(lambda *a: jnp.sum(fn(*a)), *fargs)

        def loss(*largs):
            return jnp.sum(fn(*largs) ** 2)

        def grad_scalar(*a):
            return sum(jnp.sum(t) for t in jax.tree.leaves(
                jax.grad(loss, argnums=(0, 1, 2))(*a)))
        try:
            bwd = timeit(grad_scalar, *fargs)
        except Exception as e:
            print(f"  ({name} backward failed: {e})")
            bwd = float("nan")
        rows.append((name, fwd, bwd, err))
        print(f"{name:28s} fwd {fwd:8.2f} ms   fwd+bwd {bwd:8.2f} ms   "
              f"max|err| {err:.2e}", flush=True)

    audit("attend_chunked (C=2304)",
          jax.jit(lambda q1, k1, v1: attend_chunked(q1, k1, v1, tau)),
          q, k, v)
    try:
        from cocosnet_tpu.ops.pallas_corr_bigc import attend_pallas_bigc
        audit("pallas_bigc (C=2304)",
              jax.jit(lambda q1, k1, v1: attend_pallas_bigc(q1, k1, v1, tau)),
              q, k, v)
    except Exception as e:
        print(f"(pallas_bigc skipped: {e})")
    audit("attend_unfold (9-shift XLA)",
          jax.jit(lambda f1, g1, v1: attend_unfold(f1, g1, v1, tau, 3, True,
                                                   row_chunk=4)),
          f, g, v)
    from cocosnet_tpu.ops.pallas_shift9 import attend_shift9
    audit("attend_shift9 (fused pallas)",
          jax.jit(lambda f1, g1, v1: attend_shift9(f1, g1, v1, tau, True)),
          f, g, v)

    print("\n| path | fwd ms | fwd+bwd ms | max err vs f32-HIGHEST oracle |")
    print("|---|---|---|---|")
    for name, fwd, bwd, err in rows:
        print(f"| {name} | {fwd:.2f} | {bwd:.2f} | {err:.2e} |")


if __name__ == "__main__":
    main()
