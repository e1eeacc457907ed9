"""Spatial-parallel (SP) correlation: shard the query rows of the
match_kernel-unfold correlation over a mesh axis.

The reference's only parallelism is data-parallel (one sample per device,
pix2pix_trainer.py:23-26). The correlation is the quadratic object — at
512px the logits are 16384^2 per sample and the attend dominates latency —
so the TPU-native scaling axis beyond batch is the SEQUENCE: each device
owns a contiguous block of query rows, keys/values are all-gathered once
over ICI, and the one-row halos the 3x3 unfold needs travel by
`lax.ppermute` (whose zero-fill at the edge devices is EXACTLY the unfold's
zero padding — no boundary special-casing).

    out rows owned            collectives used
    device 0:  [0,   H/m)     all_gather(g, v)  +  ppermute halos of f
    device 1:  [H/m, 2H/m)    ...
    ...

Per-device cost: 1/m of the N x N x C' matmul FLOPs, O(N*C) memory (the
logits stream block-row-wise exactly as in ops/corr_shift.py). Use inside
`shard_map` over a Mesh axis (tests/test_corr_sp.py shows the pattern);
compose with the `data` axis for batch parallelism: P("data", "model")
sharding on the NHWC feature rows gives 2-D parallel correlation.

This extends SURVEY §2.10 beyond the reference's scope (the `model` axis
round 1 only reserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cocosnet_tpu.ops.corr_shift import _safe_norm

Array = jax.Array
_PRECISION = jax.lax.Precision.HIGH


def _halo_rows(x: Array, p: int, axis_name: str) -> Array:
    """Extend (B, Hl, W, C) with p rows from the previous/next shard along
    `axis_name`. Edge devices receive zeros from ppermute's unmatched
    slots — identical to the unfold's zero padding of the global image."""
    if p == 0:  # match_kernel=1: no neighbour rows needed
        return x
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    # bottom p rows of the previous shard -> my top halo
    fwd = [(i, (i + 1) % n) for i in range(n - 1)]  # no wraparound
    top = jax.lax.ppermute(x[:, -p:], axis_name, fwd)
    # top p rows of the next shard -> my bottom halo
    bwd = [(i + 1, i) for i in range(n - 1)]
    bot = jax.lax.ppermute(x[:, :p], axis_name, bwd)
    return jnp.concatenate([top, x, bot], axis=1)


def _box_stats_from_halo(xh: Array, k: int, h: int, w: int):
    """Per-position unfold-descriptor (sum, sumsq) for the h owned rows,
    from the halo-extended block xh (B, h+2p, W, C); zero-pad columns."""
    p = k // 2
    s1h = jnp.sum(xh, axis=-1)            # (B, h+2p, W)
    s2h = jnp.sum(xh * xh, axis=-1)

    def box(z):
        zp = jnp.pad(z, ((0, 0), (0, 0), (p, p)))
        return sum(zp[:, dy:dy + h, dx:dx + w]
                   for dy in range(k) for dx in range(k))

    return box(s1h), box(s2h)


def attend_unfold_sp(f_shard: Array, g_shard: Array, v_shard: Array,
                     tau: float, axis_name: str,
                     match_kernel: int = 3, pono_c: bool = True,
                     row_chunk: int = 8) -> Array:
    """SP form of ops/corr_shift.attend_unfold, called inside shard_map.

    f_shard: (B, Hl, W, C) — this device's contiguous query rows.
    g_shard: (B, Hl, W, C) — this device's shard of the key feature map.
    v_shard: (B, Hl*W, D) — this device's shard of the value rows.
    Returns (B, Hl*W, D): the warped output for the owned query rows —
    concatenating shards over the axis reproduces the single-device result.

    Only PONO_C centering is offered in SP form (the flagship config);
    spatial centering would need psum'd global descriptor means — fall back
    to the replicated path for that rare flag combination.
    """
    if not pono_c:
        raise NotImplementedError(
            "attend_unfold_sp implements PONO_C centering (the flagship "
            "config); use the replicated attend_unfold for spatial centering")
    k = match_kernel
    p = k // 2
    b, hl, w, c = f_shard.shape
    cd = c * k * k
    f_shard = f_shard.astype(jnp.float32)
    g_shard = g_shard.astype(jnp.float32)

    # keys/values once over ICI; (B, H, W, C) / (B, N, D)
    g_full = jax.lax.all_gather(g_shard, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v_shard, axis_name, axis=1, tiled=True)
    v_full = v_full.astype(jnp.float32)
    hg = g_full.shape[1]
    n_keys = hg * w

    # ---- key-side stats (replicated computation over the gathered keys)
    gp = jnp.pad(g_full, ((0, 0), (p, p), (p, p), (0, 0)))
    gs1h, gs2h = _box_stats_from_halo(
        jnp.pad(g_full, ((0, 0), (p, p), (0, 0), (0, 0))), k, hg, w)
    k_mu = (gs1h / cd).reshape(b, n_keys)
    k_norm = _safe_norm((gs2h - gs1h * gs1h / cd).reshape(b, n_keys))
    g_flat = gp.reshape(b, (hg + 2 * p) * (w + 2 * p), c)

    # ---- query-side stats from the halo-extended shard
    fh = _halo_rows(f_shard, p, axis_name)          # (B, hl+2p, W, C)
    fs1, fs2 = _box_stats_from_halo(fh, k, hl, w)
    q_mu = (fs1 / cd).reshape(b, hl * w)
    q_norm = _safe_norm((fs2 - fs1 * fs1 / cd).reshape(b, hl * w))

    fp = jnp.pad(fh, ((0, 0), (0, 0), (p, p), (0, 0)))  # cols

    # ---- stream owned query rows in blocks (same recipe as attend_unfold)
    r = row_chunk
    while hl % r != 0:
        r -= 1
    n_chunks = hl // r
    wp = w + 2 * p
    hp = hg + 2 * p
    f_rows = jnp.stack([fp[:, i * r: i * r + r + 2 * p]
                        for i in range(n_chunks)])
    qmu_rows = jnp.stack(
        [q_mu.reshape(b, hl, w)[:, i * r:(i + 1) * r].reshape(b, r * w)
         for i in range(n_chunks)])
    qn_rows = jnp.stack(
        [q_norm.reshape(b, hl, w)[:, i * r:(i + 1) * r].reshape(b, r * w)
         for i in range(n_chunks)])

    @jax.checkpoint
    def body(args):
        f_blk, qmu_b, qn_b = args
        s = jnp.einsum("bqc,bkc->bqk", f_blk.reshape(b, -1, c), g_flat,
                       preferred_element_type=jnp.float32,
                       precision=_PRECISION)
        s5 = s.reshape(b, r + 2 * p, wp, hp, wp)
        raw = 0.0
        for dy in range(k):
            for dx in range(k):
                raw = raw + s5[:, dy:dy + r, dx:dx + w, dy:dy + hg, dx:dx + w]
        raw = raw.reshape(b, r * w, n_keys)
        adj = raw - cd * qmu_b[..., None] * k_mu[:, None, :]
        logits = adj / (qn_b[..., None] * k_norm[:, None, :]) / tau
        prob = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", prob, v_full,
                          preferred_element_type=jnp.float32,
                          precision=_PRECISION)

    out = jax.lax.map(body, (f_rows, qmu_rows, qn_rows))
    return jnp.moveaxis(out, 0, 1).reshape(b, hl * w, v_full.shape[-1])


def attend_sp(q_feat: Array, k_feat: Array, v: Array, tau: float,
              mesh=None, match_kernel: int = 3, pono_c: bool = True,
              use_pallas: bool = True, model: int = 0) -> Array:
    """Product entry point: spatial-parallel attend on GLOBAL arrays.

    Shards the query rows (and the value rows) of the match_kernel-unfold
    correlation over the mesh's `model` axis via shard_map, composing with
    `data`-axis batch sharding; keys are all-gathered inside. This is what
    CorrespondenceNet dispatches to when opt.mesh_model > 1 — the user-facing
    form of the reference's quadratic object (correspondence.py:291-307)
    sharded over chips at 512px+.

    q_feat/k_feat: (B, H, W, C) feature maps (theta/phi conv outputs);
    v: (B, H*W, D) value rows. Returns (B, H*W, D), numerically matching
    the single-device attend_unfold/attend_shift9 (tests/test_corr_sp.py,
    tests/test_mesh_model.py). Requires PONO_C and H % model == 0.
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from cocosnet_tpu import mesh as M

    if not pono_c:
        raise NotImplementedError(
            "spatial-parallel correlation implements PONO_C centering (the "
            "flagship config); run replicated for spatial centering")
    # `model` sizes the fallback all-devices mesh when no global mesh was
    # registered (bare jit callers, e.g. tests); a registered mesh wins
    mesh = mesh if mesh is not None else M.global_mesh(model=max(model, 1))
    m = int(mesh.shape.get("model", 1))
    b, h, w, c = q_feat.shape
    if h % m != 0:
        raise ValueError(f"feature rows H={h} must divide the model axis {m}")
    hl = h // m
    use_fused = (use_pallas and match_kernel == 3
                 and jax.default_backend() == "tpu"
                 and shift9_sp_supported(hl, w, c))
    if use_fused:
        fn = partial(attend_shift9_sp, tau=tau, axis_name="model",
                     pono_c=pono_c)
    else:
        fn = partial(attend_unfold_sp, tau=tau, axis_name="model",
                     match_kernel=match_kernel, pono_c=pono_c)
    spec4 = PS("data", "model", None, None)
    spec3 = PS("data", "model", None)
    mapped = shard_map(fn, mesh=mesh, in_specs=(spec4, spec4, spec3),
                       out_specs=spec3, check_vma=False)
    return mapped(q_feat, k_feat, v)


def shift9_sp_supported(hl: int, w: int, c: int) -> bool:
    """Per-shard lowering constraints for attend_shift9_sp: same lane/
    block rules as the single-device kernel, applied to the SHARD's row
    count (whole-row query blocks must tile hl)."""
    from cocosnet_tpu.ops.pallas_shift9 import _block_rows, _block_rows_bwd

    def tiles(r):  # a shard smaller than one block is a single block
        return hl % r == 0 if hl >= r else True

    return ((3 * c) % 128 == 0 and w % 64 == 0
            and tiles(_block_rows(w)) and tiles(_block_rows_bwd(w)))


def attend_shift9_sp(f_shard: Array, g_shard: Array, v_shard: Array,
                     tau: float, axis_name: str,
                     pono_c: bool = True) -> Array:
    """SP form of ops/pallas_shift9.attend_shift9: the fused flash kernel
    runs on each device's query-row shard against the all-gathered keys.

    Same contract as attend_unfold_sp (call inside shard_map; concatenating
    shard outputs over `axis_name` reproduces the single-device result),
    but the per-device compute is the Pallas kernel instead of the XLA
    streaming body — the production TPU configuration for multi-chip 512px
    inference/training where the N^2 logits dominate.

    Collective structure and its backward (all handled by jax AD outside
    the kernel's custom VJP):
      all_gather(g, v)  -> transpose: psum_scatter of dG3/dVt shards
      ppermute halos(f) -> transpose: reverse ppermute of the halo grads
    so the fused kernel's dG3 partial (computed per device over all keys)
    is reduce-scattered over ICI automatically.
    """
    if not pono_c:
        raise NotImplementedError(
            "attend_shift9_sp implements PONO_C centering (the flagship "
            "config); use attend_unfold_sp/attend_unfold for spatial "
            "centering")
    from cocosnet_tpu.ops.corr_shift import _unfold_stats
    from cocosnet_tpu.ops.pallas_shift9 import (_block_rows,
                                                _block_rows_bwd, _core,
                                                _row_stack3, _is_tpu)

    b, hl, w, c = f_shard.shape
    cd = c * 9
    # the pallas grid floor-divides rows into whole-row blocks: an hl that
    # doesn't tile would silently leave output rows unwritten, so reject it
    # here (on TPU additionally require the Mosaic lane constraints)
    if _is_tpu() and not shift9_sp_supported(hl, w, c):
        raise ValueError(
            f"attend_shift9_sp: shard shape (hl={hl}, w={w}, c={c}) fails "
            "the kernel lowering constraints (shift9_sp_supported); use "
            "attend_unfold_sp for this shape")
    for r in (_block_rows(w), _block_rows_bwd(w)):
        if hl > r and hl % r != 0:
            raise ValueError(
                f"attend_shift9_sp: shard rows hl={hl} do not tile the "
                f"kernel's {r}-row blocks; pick a divisor shard count or "
                "use attend_unfold_sp")
    # gather in the source dtype (halves ICI bytes for bf16 callers);
    # the f32 cast happens on the gathered copy
    f_shard = f_shard.astype(jnp.float32)
    g_full = jax.lax.all_gather(g_shard, axis_name, axis=1,
                                tiled=True).astype(jnp.float32)
    v_full = jax.lax.all_gather(v_shard, axis_name, axis=1,
                                tiled=True).astype(jnp.float32)
    hg = g_full.shape[1]
    n_keys = hg * w

    # key-side stats + row-stack from the gathered map (replicated compute)
    gs1, gs2 = _unfold_stats(g_full, 3)
    k_mu = (gs1 / cd).reshape(b, n_keys)
    k_norm = _safe_norm((gs2 - gs1 * gs1 / cd).reshape(b, n_keys))
    g3 = _row_stack3(g_full).reshape(b, n_keys, 3 * c)

    # query-side stats + row-stack from the ppermute-haloed shard: the
    # boundary rows' dy-neighbours come from the adjacent devices (zeros
    # at the global edges = the unfold's padding)
    fh = _halo_rows(f_shard, 1, axis_name)            # (B, hl+2, W, C)
    fs1, fs2 = _box_stats_from_halo(fh, 3, hl, w)
    q_mu = (fs1 / cd).reshape(b, hl * w)
    q_norm = _safe_norm((fs2 - fs1 * fs1 / cd).reshape(b, hl * w))
    f3 = jnp.concatenate([fh[:, 0:hl], fh[:, 1:hl + 1], fh[:, 2:hl + 2]],
                         axis=-1).reshape(b, hl * w, 3 * c)

    zero = jnp.zeros_like(q_mu)
    qv = jnp.stack([1.0 / (q_norm * tau), cd * q_mu, zero, zero], -1)
    kv = jnp.stack([1.0 / k_norm, k_mu, jnp.zeros_like(k_mu),
                    jnp.zeros_like(k_mu)], 1)

    vt = jnp.swapaxes(v_full, 1, 2)
    return _core(f3, g3, vt, qv, kv, w)
