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

    _mxu_tail(x3_s, k3_ref, b_ref, out_ref,
              stats_ref if want_stats else None,
              r, wo, cp, cot, leaky, reflect_w)


def _mxu_tail(x3_s, k3_ref, b_ref, out_ref, stats_ref,
              r, wo, cp, cot, leaky, reflect_w):
    """Shared epilogue of the fused conv kernels: 3 dx-tap MXU dots against
    the packed weights + bias + optional LeakyReLU + optional IN moments."""
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
    if stats_ref is not None:
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


# --------------------------------------------------------------------------
# Training dW kernel: Pallas weight-gradient for the 3x3 stride-1 stacks.
#
# PROFILE_TRAIN.md (round 4) pins the G backward at ~39% MFU and names the
# cause: XLA computes dL/dW as a patch correlation whose GEMM contracts over
# the batch dim (8 rows) — the MXU starves. This kernel folds the batch AND
# spatial dims into one long contraction: with the same overlapping row-slab
# DMA and in-VMEM 3-tap construction as the forward,
#
#   dW_packed[dx] = tap(dx)^T @ g        (3Cp, R*W) x (R*W, Cot)
#
# accumulated over a (cout-tile, batch, row-block) grid into a VMEM-resident
# f32 output block (K per step = R*W >= 1024 rows). The packed layout is
# exactly _pack_k3's, so unpacking is a reshape+transpose; db rides along
# from the g block already in VMEM. Wired into training via
# conv3x3_xla_pdw: the forward stays the UNTOUCHED XLA conv (round 4's A/B
# showed replacing it severs XLA's fusions and loses), dx stays XLA's own
# transposed conv via jax.linear_transpose, and only dW/db route here.
# Matches the hot training loop of /root/reference/trainers/
# pix2pix_trainer.py:52-62 + models/networks/architecture.py:40-51.
# --------------------------------------------------------------------------


def _pick_tiles_dw(ho: int, wo: int, cp: int, cop: int, itemsize: int):
    """(rows per block, cout tile) for the dW kernel. The f32 accumulator
    block (3, 3Cp, Cot) lives in VMEM for a whole cout-tile sweep; prefer
    the largest Cot that fits (x is re-fetched once per cout tile)."""
    def vmem(rr, ct):
        return (2 * (rr + 2) * wo * cp * itemsize    # x slabs (2 buffers)
                + rr * wo * 3 * cp * itemsize        # x3 scratch
                + rr * wo * 3 * cp * itemsize        # one shifted tap temp
                + 2 * rr * wo * ct * itemsize        # g blocks (piped)
                + 3 * 3 * cp * ct * 4                # dw f32 block
                + ct * 4)                            # db

    m = cop // 128
    cot_divs = [128 * d for d in range(m, 0, -1) if m % d == 0]
    r = min(max(1, 1024 // wo), ho)
    while ho % r != 0:
        r -= 1
    for ct in cot_divs:
        rr = r
        while rr >= 1 and vmem(rr, ct) > _BUDGET:
            rr -= 1
            while rr > 1 and ho % rr != 0:
                rr -= 1
        if rr >= 1 and vmem(rr, ct) <= _BUDGET:
            return rr, ct
    return None


def _dw_kernel(r, wo, cp, cot, nh, nb, reflect_w,
               xq_hbm, g_ref, dw_ref, db_ref, slab, x3_s, sem):
    j = pl.program_id(0)
    ib = pl.program_id(1)
    ih = pl.program_id(2)
    step = ib * nh + ih
    nsteps = nb * nh

    def fetch(s):
        b = s // nh
        h = s % nh
        return pltpu.make_async_copy(
            xq_hbm.at[b, pl.ds(h * r, r + 2)],
            slab.at[s % 2],
            sem.at[s % 2],
        )

    @pl.when(step == 0)
    def _():
        fetch(0).start()
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    @pl.when(step + 1 < nsteps)
    def _():
        fetch(step + 1).start()
    fetch(step).wait()
    x = slab[step % 2]                   # (R+2, W, Cp)
    x3_s[:] = jnp.concatenate([x[0:r], x[1:r + 1], x[2:r + 2]], axis=-1)
    x3 = x3_s[:]

    def tap(dx):
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

    gr = g_ref[0].reshape(r * wo, cot)
    for dx in range(3):
        dw_ref[dx] += jax.lax.dot_general(
            tap(dx).reshape(r * wo, 3 * cp), gr,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    db_ref[0, :] += jnp.sum(gr.astype(jnp.float32), axis=0)


def conv3x3_dw(x: Array, g: Array, *, reflect: bool = False):
    """Weight+bias gradient of a 3x3 stride-1 'SAME' conv (zero or reflect
    ring): returns (dw HWIO f32 (3,3,Cin,Cout), db f32 (Cout,)) for
    upstream cotangent g (B,H,W,Cout). Exact adjoint of the forward —
    dW_packed[dx] = tap(dx)^T g with the same tap construction, so the
    padded operand values (zero columns / reflected columns) contribute
    exactly as the forward consumed them."""
    cin, cout = x.shape[-1], g.shape[-1]
    cp = _round_up(cin, 128)
    cop = _round_up(cout, 128)
    xq = _pad_input(x, cp, reflect)
    if cop != cout:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, cop - cout)))
    b, hq, wo, _ = xq.shape
    ho = hq - 2
    tiles = _pick_tiles_dw(ho, wo, cp, cop, jnp.dtype(x.dtype).itemsize)
    assert tiles is not None, "conv3x3_dw_supported must gate infeasible shapes"
    r, cot = tiles
    nh = ho // r
    nc = cop // cot

    dwp, db = pl.pallas_call(
        functools.partial(_dw_kernel, r, wo, cp, cot, nh, b, reflect),
        grid=(nc, b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # xq stays in HBM
            pl.BlockSpec((1, r, wo, cot), lambda j, ib, ih: (ib, ih, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((3, 3 * cp, cot), lambda j, ib, ih: (0, 0, j)),
            pl.BlockSpec((1, cot), lambda j, ib, ih: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3 * cp, cop), jnp.float32),
            jax.ShapeDtypeStruct((1, cop), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, r + 2, wo, cp), x.dtype),
            pltpu.VMEM((r, wo, 3 * cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=not _is_tpu(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * wo * 9 * cp * cop,
            bytes_accessed=(nc * b * hq * wo * cp * 2
                            + b * ho * wo * cop * 2
                            + 9 * cp * cop * 4),
            transcendentals=0,
        ),
    )(xq, g)
    # invert _pack_k3: (3:dx, 3Cp:(dy,c), Cop) -> HWIO (dy, dx, Cin, Cout)
    dw = dwp.reshape(3, 3, cp, cop)[:, :, :cin, :cout]
    dw = jnp.transpose(dw, (1, 0, 2, 3))
    return dw, db[0, :cout]


# Shapes where the Pallas dW kernel BEATS XLA's weight-gradient conv on the
# real chip — the round-5 per-layer A/B (tools/ab_dw.py, batch 8, committed
# at artifacts/ab_dw/ab_dw_r5.log). Keyed (H, W, Cin, Cout, reflect).
# Routing every feasible shape lost end-to-end (15.99 vs 19.34 img/s): the
# kernel wins where Cout is wide and the f32 accumulator sweep amortizes
# (128->512 1.33x, 512->512 1.40x, 128->256 2.32x) but loses badly on
# odd-channel (151/407) and high-res low-channel shapes where XLA's patch
# correlation is already near roofline. Winners only: 96.0 -> 82.7 ms of dW
# per G backward (1.16x).
_DW_WINNERS = frozenset({
    (64, 64, 128, 512, True),    # 1.33x, 40 calls/step
    (64, 64, 512, 512, True),    # 1.40x, 12
    (64, 64, 128, 256, True),    # 2.32x, 8
    (64, 64, 256, 256, True),    # 1.34x, 4
    (64, 64, 154, 128, True),    # 1.08x, 3
    (128, 128, 154, 128, True),  # 1.14x, 3
})


def conv3x3_dw_supported(x_shape, g_shape, *, reflect: bool = False,
                         itemsize: int = 2) -> bool:
    """Gate for routing a training conv's dW through the Pallas kernel
    (conv3x3_xla_pdw). Two layers: feasibility (mirrors the forward
    kernel's constraints) AND measured per-shape benefit (_DW_WINNERS,
    from tools/ab_dw.py on the real chip). COCOSNET_PALLAS_DW=all ignores
    the winners table (feasibility only — what the A/B tool measures);
    =1 routes the winners; the DEFAULT is 0 (off): the winners save
    13.3 ms/step of standalone dW time (artifacts/ab_dw) but the
    custom-VJP routing costs ~19 ms/step of forward-side fusion/layout
    that XLA's own autodiff keeps — end-to-end A/B on the real chip,
    batch 8: 19.32 img/s (XLA dW) vs 18.48-18.58 (gated Pallas dW).
    Per-layer wins that lose end-to-end are the round-5 lesson, twice."""
    import os
    mode = os.environ.get("COCOSNET_PALLAS_DW", "0")
    if mode in ("0", "false"):
        return False
    if not _is_tpu():
        return False
    n, h, w, c = x_shape
    cout = g_shape[-1]
    if mode != "all" and (h, w, c, cout, reflect) not in _DW_WINNERS:
        return False
    if w % 16 != 0 or w < 32 or h < 8 or h * w < 2048:
        return False
    if c < 64 or cout < 64:
        return False
    cp, cop = _round_up(c, 128), _round_up(cout, 128)
    return _pick_tiles_dw(h, w, cp, cop, itemsize) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_xla_pdw(x: Array, kernel: Array, bias: Array, reflect: bool):
    """3x3 stride-1 'SAME' conv (zero or reflect ring) whose FORWARD and
    dL/dx are exactly the XLA ops the plain path runs (so producer/consumer
    fusions around the conv are untouched — the round-4 lesson), and whose
    dL/dW + dL/db run the Pallas dW kernel above."""
    return _xla_conv3x3(x, kernel, reflect) + bias.astype(x.dtype)


def _xla_conv3x3(x: Array, kernel: Array, reflect: bool) -> Array:
    if reflect:
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        pad = ((0, 0), (0, 0))
    else:
        pad = ((1, 1), (1, 1))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _pdw_fwd(x, kernel, bias, reflect):
    return conv3x3_xla_pdw(x, kernel, bias, reflect), (x, kernel)


def _pdw_bwd(reflect, res, g):
    x, kernel = res
    # dx: transpose the linear map x -> conv(x) symbolically — emits the
    # identical transposed-conv (+ pad adjoint for reflect) XLA's own AD
    # produces, without re-running the forward
    dx = jax.linear_transpose(
        lambda xx: _xla_conv3x3(xx, kernel, reflect), x)(g)[0]
    dw, db = conv3x3_dw(x, g.astype(x.dtype), reflect=reflect)
    return dx, dw.astype(jnp.float32), db


conv3x3_xla_pdw.defvjp(_pdw_fwd, _pdw_bwd)


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


# --------------------------------------------------------------------------
# One-hot-input conv: the seg adaptor's first conv reads a (B,256,256,151)
# bf16 one-hot that is informationally a (B,256,256) label map — PROFILE.md
# pins it as HBM-bound at the head of every forward (the round-5 queue's
# item 3). This kernel streams the LABEL MAP (int32, ~1/300th the bytes)
# and expands the one-hot rows in VMEM with an iota compare, then runs the
# identical packed-3-tap MXU tail as the dense kernel. Semantically it is
# conv3x3(one_hot(labels, C), W) + b with zero padding: a padded position
# carries the sentinel -1, whose one-hot row is all zeros — exactly the
# zero-pad ring's contribution.
# Matches /root/reference/models/networks/generator.py:101-118 (the domain
# adaptor consuming input_semantics) fed by the one-hot scatter of
# /root/reference/models/pix2pix_model.py:176-187.
# --------------------------------------------------------------------------


def _pick_tiles_onehot(ho: int, wo: int, cp: int, cop: int, itemsize: int):
    """(rows per block, cout tile) — the dense picker minus the wide input
    slabs (the label slab is int32 single-channel, ~free)."""
    def vmem(rr, ct):
        return (2 * (rr + 2) * wo * 4                    # label blocks (i32)
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
    if vmem(max(r, 1), cot) > _BUDGET:
        return None
    return max(r, 1), cot


def _onehot_kernel(r, wo, cp, cot, leaky, want_stats,
                   lab_ref, k3_ref, b_ref, out_ref, *rest):
    if want_stats:
        stats_ref, x3_s = rest
    else:
        stats_ref = None
        (x3_s,) = rest
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        # The label block arrives via the ordinary Pallas pipeline: the
        # overlapping (R+2)-row windows are pre-gathered in XLA (int32
        # labels are ~1/300th the one-hot bytes, so the duplicated halo
        # rows are free) — a manual DMA would have to slice the sublane
        # dim of a (B, Hq, W) memref at offset h*r, which Mosaic requires
        # to be 8-aligned (r is typically 4).
        ids = lab_ref[0, 0]                          # (R+2, W) int32
        ids3 = jnp.concatenate(
            [ids[0:r][..., None], ids[1:r + 1][..., None],
             ids[2:r + 2][..., None]], axis=-1)      # (R, W, 3) dy-major
        iota = jax.lax.broadcasted_iota(jnp.int32, (r, wo, 3, cp), 3)
        x3_s[:] = (ids3[..., None] == iota).astype(
            x3_s.dtype).reshape(r, wo, 3 * cp)

    _mxu_tail(x3_s, k3_ref, b_ref, out_ref, stats_ref,
              r, wo, cp, cot, leaky, reflect_w=False)


def conv3x3_onehot_supported(lab_shape, n_classes: int, cout: int, *,
                             itemsize: int = 2) -> bool:
    """Gate: TPU inference (no VJP — the training trace falls back to the
    dense path), lane-aligned width, enough GEMM rows, VMEM-feasible tiles."""
    import os
    if os.environ.get("COCOSNET_ONEHOT_CONV", "1") in ("0", "false"):
        return False
    if not _is_tpu() or _IN_TRAINING_TRACE:
        return False
    if len(lab_shape) != 3:
        return False
    _, h, w = lab_shape
    if w % 128 != 0 or h < 8 or h * w < 2048 or cout < 64:
        return False
    cp, cop = _round_up(n_classes, 128), _round_up(cout, 128)
    return _pick_tiles_onehot(h, w, cp, cop, itemsize) is not None


def conv3x3_onehot(labels: Array, kernel: Array, bias: Array | None, *,
                   dtype=None, leaky: float | None = None,
                   want_stats: bool = False):
    """conv3x3_fused(one_hot(labels, C), kernel, bias) with the one-hot
    never materialized in HBM. labels: (B, H, W) integer class ids —
    out-of-range ids (the -1 halo sentinel, padded lanes) contribute
    zeros, exactly like the zero-pad ring / zero-padded kernel rows.
    `dtype` is the compute dtype the dense path would have used for the
    one-hot (defaults to kernel.dtype). With want_stats, additionally
    returns instance-norm (mean, var) f32 (B,1,1,Cout) from the f32
    accumulator — same contract as conv3x3_fused_stats."""
    c, cout = kernel.shape[2], kernel.shape[3]
    dtype = dtype or kernel.dtype
    cp = _round_up(c, 128)
    cop = _round_up(cout, 128)
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    labq = jnp.pad(labels.astype(jnp.int32), ((0, 0), (1, 1), (0, 0)),
                   constant_values=-1)
    k3 = _pack_k3(kernel, cp, cop).astype(dtype)
    b2 = jnp.pad(bias.astype(jnp.float32), (0, cop - cout)).reshape(1, cop)
    b, hq, wo = labq.shape
    ho = hq - 2
    tiles = _pick_tiles_onehot(ho, wo, cp, cop, jnp.dtype(dtype).itemsize)
    assert tiles is not None, \
        "conv3x3_onehot_supported must gate infeasible shapes"
    r, cot = tiles
    nh = ho // r
    nc = cop // cot
    # Overlapping (R+2)-row windows as a leading grid dim, so the kernel's
    # block fetch never slices the tiled sublane dim (see _onehot_kernel).
    win = (jnp.arange(nh)[:, None] * r + jnp.arange(r + 2)[None, :])
    labw = labq[:, win]                                # (B, nh, R+2, W)

    out_shape = [jax.ShapeDtypeStruct((b, ho, wo, cop), dtype)]
    out_specs = [pl.BlockSpec((1, r, wo, cot),
                              lambda ib, ih, j: (ib, ih, 0, j))]
    if want_stats:
        out_shape.append(jax.ShapeDtypeStruct((b, nh, 2, cop), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 2, cot),
                                      lambda ib, ih, j: (ib, ih, 0, j)))
    res = pl.pallas_call(
        functools.partial(_onehot_kernel, r, wo, cp, cot, leaky,
                          want_stats),
        grid=(b, nh, nc),
        in_specs=[
            pl.BlockSpec((1, 1, r + 2, wo), lambda ib, ih, j: (ib, ih, 0, 0)),
            pl.BlockSpec((3, 3 * cp, cot), lambda ib, ih, j: (0, 0, j)),
            pl.BlockSpec((1, cot), lambda ib, ih, j: (0, j)),
        ],
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shape if want_stats else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((r, wo, 3 * cp), dtype),
        ],
        interpret=not _is_tpu(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * wo * 9 * cp * cop,
            bytes_accessed=b * (hq * wo * 4
                                + 2 * ho * wo * cop
                                * jnp.dtype(dtype).itemsize),
            transcendentals=0,
        ),
    )(labw, k3, b2)
    if not want_stats:
        return res[..., :cout] if cop != cout else res
    out, parts = res
    if cop != cout:
        out = out[..., :cout]
    sums = jnp.sum(parts, axis=1)                      # (B, 2, Cop)
    n = float(ho * wo)
    mean = (sums[:, 0, :cout] / n)[:, None, None, :]
    var = jnp.maximum(sums[:, 1, :cout][:, None, None, :] / n - mean * mean,
                      0.0)
    return out, mean, var
