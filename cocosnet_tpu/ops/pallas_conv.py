"""Fused 3x3 stride-1 convolution kernel (TPU Pallas, implicit GEMM).

Why: the flagship inference profile (PROFILE.md) shows 80% of remaining time
in reference-parity conv stacks (domain adaptors + SPADE generator) running
at 30-40% MFU under XLA's conv emitter — the 64-512 input channels underfill
its tiling and every activation makes extra HBM round trips through the
space-to-batch rewrite. Nearly all of those FLOPs are 3x3 stride-1 convs
(NormConv layers 1/3/5, SPADE conv_0/conv_1/mlp convs, the correspondence
residual stack — models/networks/generator.py:101-118, architecture.py:40-51,
correspondence.py:13-36). This kernel computes exactly that case as an
implicit GEMM tuned to the MXU:

  - Input rows stream HBM->VMEM through a manually double-buffered DMA of
    overlapping (R+2)-row slabs (grid = row blocks), so each input row is
    fetched ~(1 + 2/R)x; no 9x im2col / 3x row-stack tensor ever exists.
  - The 3 dy taps fold into the channel dim in VMEM (concat of three
    row-shifted views -> 3C lanes), turning the conv into 3 MXU dots of
    shape (R*W, 3C) x (3C, Cot) — one per dx tap.
  - The dx taps never need a width halo: the shifted operand is rebuilt by
    slice+concat with a mode-specific edge column (zeros for zero padding,
    the reflected column for ReflectionPad2d), so W stays lane/sublane
    aligned and no padded copy of the width is materialized.
  - Wide outputs tile over a third grid dimension (Cout tiles) so the
    packed weights never exceed the VMEM budget; the row slab is fetched
    once per row block and reused across Cout tiles via a persistent
    scratch.
  - Epilogue fused into the same pass: bias add + optional LeakyReLU.

Channel counts are zero-padded up to the 128-lane tile (and the kernel
packed to match) — padded lanes multiply zeros and cannot affect the
result.

`conv3x3_fused` carries a custom VJP whose backward runs the standard XLA
transposed convs (dx: 180deg-rotated kernel through the pad adjoint; dw:
patch correlation) — the same math lax.conv's own AD produces — so the
kernel is usable inside the training step from day one; a Pallas backward
can slot in later without touching callers.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BUDGET = 12 * 1024 * 1024   # of the 16MB scoped VMEM limit


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tiles(ho: int, wo: int, cp: int, cop: int, itemsize: int):
    """(rows per block, cout tile): target >=1024 GEMM rows; shrink the
    cout tile first (weights dominate for wide layers), then rows."""
    def vmem(rr, ct):
        return (2 * (rr + 2) * wo * cp * itemsize        # DMA slabs
                + 2 * rr * wo * 3 * cp * itemsize        # x3 scratch + tap
                + rr * wo * ct * 4                       # f32 acc
                + 2 * 9 * cp * ct * itemsize             # k3 tile (piped)
                + 2 * rr * wo * ct * itemsize)           # out (2 buffers)

    m = cop // 128
    cot_divs = [128 * d for d in range(m, 0, -1) if m % d == 0]
    cot = cot_divs[0]
    for ct in cot_divs:
        if 2 * 9 * cp * ct * itemsize <= _BUDGET // 2:
            cot = ct
            break

    r = min(max(1, 1024 // wo), ho)
    while ho % r != 0:
        r -= 1
    while r > 1 and vmem(r, cot) > _BUDGET:
        r -= 1
        while r > 1 and ho % r != 0:
            r -= 1
    while vmem(r, cot) > _BUDGET and cot > 128:
        cot = [c for c in cot_divs if c < cot][0]
    r = max(r, 1)
    if vmem(r, cot) > _BUDGET:
        return None  # even the minimum tiling busts VMEM — caller gates
    return r, cot


def _conv_kernel(r, wo, cp, cot, nh, leaky, reflect_w, want_stats,
                 xq_hbm, k3_ref, b_ref, out_ref, *rest):
    if want_stats:
        stats_ref, slab, x3_s, sem = rest
    else:
        slab, x3_s, sem = rest
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    j = pl.program_id(2)
    step = ib * nh + ih
    nsteps = pl.num_programs(0) * nh

    def fetch(s):
        b = s // nh
        h = s % nh
        return pltpu.make_async_copy(
            xq_hbm.at[b, pl.ds(h * r, r + 2)],
            slab.at[s % 2],
            sem.at[s % 2],
        )

    @pl.when(jnp.logical_and(step == 0, j == 0))
    def _():
        fetch(0).start()

    @pl.when(j == 0)
    def _():
        @pl.when(step + 1 < nsteps)
        def _():
            fetch(step + 1).start()
        fetch(step).wait()
        x = slab[step % 2]                   # (R+2, W, Cp)
        x3_s[:] = jnp.concatenate([x[0:r], x[1:r + 1], x[2:r + 2]], axis=-1)

    x3 = x3_s[:]

    def tap(dx):
        """dx-shifted operand; the edge column realizes the pad mode."""
        if dx == 1:
            return x3
        if reflect_w:
            left = x3[:, 1:2]
            right = x3[:, wo - 2:wo - 1]
        else:
            left = jnp.zeros_like(x3[:, :1])
            right = jnp.zeros_like(x3[:, :1])
        if dx == 0:
            return jnp.concatenate([left, x3[:, :wo - 1]], axis=1)
        return jnp.concatenate([x3[:, 1:], right], axis=1)

    acc = jnp.zeros((r * wo, cot), jnp.float32)
    for dx in range(3):   # sequential: one shifted-tap temporary at a time
        acc = acc + jax.lax.dot_general(
            tap(dx).reshape(r * wo, 3 * cp), k3_ref[dx],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = acc + b_ref[:].astype(jnp.float32)
    if leaky is not None:
        acc = jnp.where(acc >= 0, acc, leaky * acc)
    if want_stats:
        # per-(sample, channel) partial moments of THIS row block, f32 from
        # the accumulator (pre-rounding) — summed over row blocks outside;
        # feeds instance norm without a second HBM pass over the output
        stats_ref[0, 0] = jnp.stack(
            [jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)])
    out_ref[0] = acc.reshape(r, wo, cot).astype(out_ref.dtype)


def _conv3x3_pallas(xq: Array, k3: Array, bias: Array, leaky,
                    reflect_w: bool, want_stats: bool = False):
    """xq: (B, Ho+2, W, Cp) H-padded input, Cp%128==0; k3: (3, 3Cp, Cop);
    bias: (1, Cop). Returns (B, Ho, W, Cop) in xq's dtype; with want_stats
    additionally a (B, nh, 2, Cop) f32 of per-row-block (sum, sumsq)."""
    b, hq, wo, cp = xq.shape
    ho = hq - 2
    cop = k3.shape[-1]
    tiles = _pick_tiles(ho, wo, cp, cop, jnp.dtype(xq.dtype).itemsize)
    assert tiles is not None, "conv3x3_supported must gate VMEM-infeasible shapes"
    r, cot = tiles
    nh = ho // r
    nc = cop // cot

    out_shape = [jax.ShapeDtypeStruct((b, ho, wo, cop), xq.dtype)]
    out_specs = [pl.BlockSpec((1, r, wo, cot),
                              lambda ib, ih, j: (ib, ih, 0, j))]
    if want_stats:
        out_shape.append(jax.ShapeDtypeStruct((b, nh, 2, cop), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 2, cot),
                                      lambda ib, ih, j: (ib, ih, 0, j)))

    res = pl.pallas_call(
        functools.partial(_conv_kernel, r, wo, cp, cot, nh, leaky,
                          reflect_w, want_stats),
        grid=(b, nh, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # xq stays in HBM
            pl.BlockSpec((3, 3 * cp, cot), lambda ib, ih, j: (0, 0, j)),
            pl.BlockSpec((1, cot), lambda ib, ih, j: (0, j)),
        ],
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shape if want_stats else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((2, r + 2, wo, cp), xq.dtype),
            pltpu.VMEM((r, wo, 3 * cp), xq.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=not _is_tpu(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * wo * 9 * cp * cop,
            bytes_accessed=2 * b * (hq * wo * cp + ho * wo * cop),
            transcendentals=0,
        ),
    )(xq, k3, bias)
    return res


def _pack_k3(kernel: Array, cp: int, cop: int) -> Array:
    """HWIO (3, 3, C, Cout) -> (3:dx, 3Cp:(dy,c), Cop), matching the
    in-VMEM channel concat order [x(h+0) | x(h+1) | x(h+2)]."""
    c, cout = kernel.shape[2], kernel.shape[3]
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, cp - c), (0, cop - cout)))
    k = jnp.transpose(k, (1, 0, 2, 3))           # (dx, dy, Cp, Cop)
    return k.reshape(3, 3 * cp, cop)


def _pad_input(x: Array, cp: int, reflect: bool) -> Array:
    """H halo (+1 row top/bottom, by pad mode) + zero channel pad to Cp."""
    mode = "reflect" if reflect else "constant"
    xq = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode=mode)
    c = x.shape[-1]
    if cp != c:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    return xq


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3(x: Array, kernel: Array, bias: Array, reflect: bool, leaky):
    cp = _round_up(x.shape[-1], 128)
    cop = _round_up(kernel.shape[-1], 128)
    xq = _pad_input(x, cp, reflect)
    k3 = _pack_k3(kernel, cp, cop).astype(x.dtype)
    b2 = jnp.pad(bias, (0, cop - bias.shape[0])).reshape(1, cop)
    out = _conv3x3_pallas(xq, k3, b2.astype(jnp.float32), leaky, reflect)
    if cop != kernel.shape[-1]:
        out = out[..., : kernel.shape[-1]]
    return out


def _fwd(x, kernel, bias, reflect, leaky):
    out = _conv3x3(x, kernel, bias, reflect, leaky)
    # the output residual is only needed to invert a fused LeakyReLU's
    # sign; storing it unconditionally costs a full activation of HBM
    # per conv in training
    return out, (x, kernel, out if leaky is not None else None)


def _full_pad(x: Array, reflect: bool) -> Array:
    mode = "reflect" if reflect else "constant"
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)


def _bwd(reflect, leaky, res, g):
    """XLA transposed-conv backward — the same math lax.conv's AD emits.
    The LeakyReLU epilogue inverts from the sign of the OUTPUT (slope>0
    preserves sign), so no pre-activation residual is stored."""
    x, kernel, out = res
    g = g.astype(jnp.float32)
    if leaky is not None:
        g = jnp.where(out >= 0, g, leaky * g)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32)
    gk = g.astype(x.dtype)
    # d(padded x): conv of g with the 180deg-rotated, IO-swapped kernel
    krot = jnp.flip(kernel, (0, 1)).swapaxes(2, 3).astype(x.dtype)
    # The full-correlation grid D(a,b) = sum_{u,v} g(a-u, b-v) W[u,v] on
    # (H+2, W+2) decomposes into an interior — exactly a SAME-zero 3x3
    # conv of g with krot, which runs through THIS kernel — plus a
    # boundary ring that only the reflect adjoint consumes (the zero-pad
    # adjoint just slices the interior). The ring cells depend on a single
    # edge row/col of g (only one u or v reaches outside), so they cost
    # four 1-D correlations instead of the padded 2-D conv XLA ran before.
    zero_b = jnp.zeros((krot.shape[-1],), jnp.float32)
    dx = _conv3x3(gk, krot, zero_b, False, None).astype(x.dtype)
    if reflect:
        bsz, hh, ww, cout = gk.shape
        kf = kernel.astype(jnp.float32)  # (3, 3, Cin, Cout)

        def line1d(line, wline, n):
            """D along one boundary: sum_v line(t-v) wline[v]; (B,n+2,Cin)."""
            out = jnp.zeros((bsz, n + 2, kf.shape[2]), jnp.float32)
            lf = line.astype(jnp.float32)
            for v in range(3):
                out = out.at[:, v:v + n].add(
                    jnp.einsum("bto,io->bti", lf, wline[v]))
            return out.astype(x.dtype)

        top = line1d(gk[:, 0], kf[0], ww)        # D[0, :]   (only u=0)
        bot = line1d(gk[:, -1], kf[2], ww)       # D[H+1, :] (only u=2)
        left = line1d(gk[:, :, 0], kf[:, 0], hh)   # D[:, 0]
        right = line1d(gk[:, :, -1], kf[:, 2], hh)  # D[:, W+1]
        # reflect scatter: cell (a,b) lands on (rho(a-1), rho(b-1)) with
        # rho(-1)=1, rho(n)=n-2; corners ride the top/bottom rows
        dx = dx.at[:, 1, :].add(top[:, 1:ww + 1])
        dx = dx.at[:, 1, 1].add(top[:, 0])
        dx = dx.at[:, 1, ww - 2].add(top[:, ww + 1])
        dx = dx.at[:, hh - 2, :].add(bot[:, 1:ww + 1])
        dx = dx.at[:, hh - 2, 1].add(bot[:, 0])
        dx = dx.at[:, hh - 2, ww - 2].add(bot[:, ww + 1])
        dx = dx.at[:, :, 1].add(left[:, 1:hh + 1])
        dx = dx.at[:, :, ww - 2].add(right[:, 1:hh + 1])
    # d kernel: correlate padded x with g, batch as the contraction dim
    xf = _full_pad(x, reflect)
    dw = jax.lax.conv_general_dilated(
        jnp.transpose(xf, (3, 1, 2, 0)), jnp.transpose(gk, (1, 2, 0, 3)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(jnp.float32)
    return dx, dw, db


_conv3x3.defvjp(_fwd, _bwd)


_IN_TRAINING_TRACE = False


@contextlib.contextmanager
def training_trace():
    """Marks the dynamic extent of tracing a TRAINING step. The fused conv
    defaults off there: the fwd+bwd A/B at batch 8 measured 16.4 vs 18.9
    img/s for XLA (the custom-VJP boundary costs XLA its producer/consumer
    fusions around every conv, which the backward's extra HBM traffic does
    not win back). Inference keeps the fused path (1.27x end-to-end).
    Set COCOSNET_FUSED_CONV_TRAIN=1 to re-enable in training (e.g. to
    re-measure after backward-kernel work)."""
    global _IN_TRAINING_TRACE
    prev = _IN_TRAINING_TRACE
    _IN_TRAINING_TRACE = True
    try:
        yield
    finally:
        _IN_TRAINING_TRACE = prev


def _base_supported(x_shape, kernel_shape, *, stride: int, dilation: int,
                    padding: int, itemsize: int) -> bool:
    import os
    if os.environ.get("COCOSNET_FUSED_CONV", "1") in ("0", "false"):
        return False
    if not _is_tpu():
        return False
    if len(x_shape) != 4 or tuple(kernel_shape[:2]) != (3, 3):
        return False
    if stride != 1 or dilation != 1 or padding != 1:
        return False
    n, h, w, c = x_shape
    cout = kernel_shape[3]
    if w % 16 != 0 or w < 32:     # sublane tile for the slab/taps
        return False
    if h < 8 or h * w < 2048:     # too few GEMM rows to fill the MXU
        return False
    if c < 64 or cout < 64:
        return False
    # the tiling search must fit scoped VMEM even at the minimum tile
    # (wide-row x wide-channel shapes can't); fall back to XLA if not.
    # The backward's dx conv swaps Cin/Cout, so both orientations must fit.
    cp, cop = _round_up(c, 128), _round_up(cout, 128)
    if _pick_tiles(h, w, cp, cop, itemsize) is None \
            or _pick_tiles(h, w, cop, cp, itemsize) is None:
        return False
    return True


def conv3x3_supported(x_shape, kernel_shape, *, stride: int,
                      dilation: int, padding: int,
                      itemsize: int = 2) -> bool:
    """Gate for the fused path: TPU, 3x3 stride-1 dilation-1 with symmetric
    padding 1 (zero or reflect ring on the UNpadded input). Width must be
    lane-tileable and the shape must be one where the measured A/B
    (PERF.md conv table) beats XLA's conv emitter."""
    import os
    if _IN_TRAINING_TRACE and \
            os.environ.get("COCOSNET_FUSED_CONV_TRAIN", "0") \
            not in ("1", "true"):
        return False
    if not _base_supported(x_shape, kernel_shape, stride=stride,
                           dilation=dilation, padding=padding,
                           itemsize=itemsize):
        return False
    # measured loss zone (e.g. the 407ch residual stack, 0.92x): large
    # channel counts that pad heavily on BOTH sides of the GEMM — XLA's
    # emitter handles the odd channel count without the 128-lane rounding
    n, h, w, c = x_shape
    cout = kernel_shape[3]
    pad_ratio = (_round_up(c, 128) / c) * (_round_up(cout, 128) / cout)
    if pad_ratio > 1.5 and min(c, cout) >= 256:
        return False
    return True


def conv3x3_stats_supported(x_shape, kernel_shape, *, stride: int,
                            dilation: int, padding: int,
                            itemsize: int = 2) -> bool:
    """Gate for the conv+instance-stats fusion (inference only: the stats
    path carries no VJP). Unlike conv3x3_supported it ACCEPTS the heavy
    pad-ratio shapes (the 407-ch residual stack): the fused stats win back
    an entire HBM pass over the output, which the 0.92x GEMM rounding
    penalty does not eat (A/B in PERF.md round 4)."""
    import os
    if _IN_TRAINING_TRACE:
        return False
    if os.environ.get("COCOSNET_FUSED_CONV_STATS", "1") in ("0", "false"):
        return False
    return _base_supported(x_shape, kernel_shape, stride=stride,
                           dilation=dilation, padding=padding,
                           itemsize=itemsize)


def conv3x3_fused_stats(x: Array, kernel: Array, bias: Array | None, *,
                        reflect: bool = False, leaky: float | None = None):
    """Fused conv + per-(sample, channel) spatial moments of the output,
    computed from the f32 accumulator inside the same kernel pass.

    Returns (out, mean, var) with mean/var f32 of shape (B, 1, 1, Cout)
    (biased var, matching nn.InstanceNorm2d / norms.instance_norm). The
    caller applies the normalization — typically fused by XLA into the
    next op's input read. Inference-only (no custom VJP)."""
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), jnp.float32)
    cp = _round_up(x.shape[-1], 128)
    cout = kernel.shape[-1]
    cop = _round_up(cout, 128)
    xq = _pad_input(x, cp, reflect)
    k3 = _pack_k3(kernel, cp, cop).astype(x.dtype)
    b2 = jnp.pad(bias.astype(jnp.float32), (0, cop - cout)).reshape(1, cop)
    out, parts = _conv3x3_pallas(xq, k3, b2, leaky, reflect, want_stats=True)
    ho, wo = out.shape[1], out.shape[2]
    if cop != cout:
        out = out[..., :cout]
    sums = jnp.sum(parts, axis=1)                      # (B, 2, Cop)
    n = float(ho * wo)
    mean = (sums[:, 0, :cout] / n)[:, None, None, :]
    # Single-pass E[x^2]-E[x]^2 in f32: loses ~log2(mean^2/var) bits of the
    # variance when |mean| >> std (clamped at 0, so worst case is an
    # over-amplified normalize, never NaN). Fine at this net's activation
    # scales / test tolerances; switch to centered two-pass sums if a
    # fidelity regression ever appears on real weights.
    var = jnp.maximum(sums[:, 1, :cout][:, None, None, :] / n - mean * mean,
                      0.0)
    return out, mean, var


def conv3x3_fused(x: Array, kernel: Array, bias: Array | None, *,
                  reflect: bool = False, leaky: float | None = None) -> Array:
    """Fused 3x3 stride-1 'SAME' conv on NHWC input (HWIO kernel) with the
    padding ring supplied by `reflect` (False = zeros, True =
    ReflectionPad2d) and an optional fused LeakyReLU. Output dtype follows
    x; accumulation f32 — the same contract as nn/layers.conv2d."""
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), jnp.float32)
    return _conv3x3(x, kernel, bias.astype(jnp.float32), reflect, leaky)
