"""Device-side image ops with torch-compatible semantics, NHWC layout.

The reference leans on torch resize/pool/unfold primitives whose exact index
math matters for pixel-fidelity parity (SURVEY §7 "hard parts"):
- F.interpolate(mode='nearest')       -> src = floor(dst * in/out)
- nn.Upsample(scale_factor=k)          -> nearest repeat (correspondence.py:188)
- nn.Upsample(bilinear)                -> half-pixel centers, align_corners=False
  (correspondence.py:184-186)
- F.avg_pool2d / F.max_pool2d          -> stride=kernel, no padding
- MultiscaleDiscriminator.downsample   -> avg_pool k3 s2 p1 count_include_pad=False
  (discriminator.py:49-52)
- F.unfold / F.fold                    -> patch extract/assemble
  (correspondence.py:276,286,311,321,353,357)

All are implemented with static shapes and XLA-friendly primitives so they
fuse under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _nearest_indices(out_size: int, in_size: int) -> Array:
    # torch 'nearest' (not nearest-exact): src = floor(dst * in/out)
    idx = jnp.floor(jnp.arange(out_size) * (in_size / out_size)).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


def resize_nearest(x: Array, out_h: int, out_w: int) -> Array:
    """F.interpolate(x, size, mode='nearest') on NHWC."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if h % out_h == 0 and w % out_w == 0:
        # integer-factor downscale: floor(i * h/out) == i * (h//out), so the
        # gather is exactly a strided slice (much cheaper on TPU)
        return x[:, :: h // out_h, :: w // out_w]
    hi = _nearest_indices(out_h, h)
    wi = _nearest_indices(out_w, w)
    return x[:, hi][:, :, wi]


def upsample_nearest(x: Array, scale: int) -> Array:
    """nn.Upsample(scale_factor=scale) — integer nearest repeat."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def upsample_bilinear(x: Array, scale: int) -> Array:
    """nn.Upsample(scale_factor=scale, mode='bilinear'), align_corners=False.

    jax.image.resize 'linear' uses half-pixel centers with edge clamping —
    the same convention as torch align_corners=False.
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * scale, w * scale, c), method="linear")


def resize_bilinear(x: Array, out_h: int, out_w: int) -> Array:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, out_h, out_w, c), method="linear")


def avg_pool(x: Array, k: int) -> Array:
    """F.avg_pool2d(x, k) — stride=k, no padding."""
    y = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), "VALID")
    return y / (k * k)


def max_pool(x: Array, k: int, stride: int | None = None) -> Array:
    """F.max_pool2d(x, k) — stride defaults to k."""
    s = stride or k
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
                             "VALID").astype(x.dtype)


def avg_pool_3x3_s2_p1(x: Array) -> Array:
    """avg_pool2d(kernel=3, stride=2, padding=1, count_include_pad=False),
    the multiscale-D inter-scale downsample (discriminator.py:49-52)."""
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1), pads)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    count = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1), pads)
    return summed / count


def adaptive_avg_pool_1x1(x: Array) -> Array:
    """F.adaptive_avg_pool2d(x, 1) on NHWC -> (N, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def adaptive_max_pool_1x1(x: Array) -> Array:
    return jnp.max(x, axis=(1, 2), keepdims=True)


def space_to_patches(x: Array, d: int) -> Array:
    """F.unfold(x, kernel=d, stride=d) for NHWC input.

    Returns (N, L, C*d*d) with torch channel-major patch ordering
    (c*d*d + kh*d + kw), L = (H/d)*(W/d).
    """
    n, h, w, c = x.shape
    gh, gw = h // d, w // d
    x = x.reshape(n, gh, d, gw, d, c)
    # -> (n, gh, gw, c, kh, kw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, gh * gw, c * d * d)


def patches_to_space(p: Array, d: int, out_h: int, out_w: int) -> Array:
    """F.fold(p, out, kernel=d, stride=d): inverse of space_to_patches."""
    n, l, cdd = p.shape
    gh, gw = out_h // d, out_w // d
    c = cdd // (d * d)
    x = p.reshape(n, gh, gw, c, d, d)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (n, gh, d, gw, d, c)
    return x.reshape(n, out_h, out_w, c)


def unfold_descriptors(x: Array, k: int) -> Array:
    """F.unfold(x, kernel_size=k, padding=k//2, stride=1) on NHWC.

    Returns (N, H*W, C*k*k), feature ordering (c, kh, kw) to match torch —
    used for match_kernel>1 patch descriptors (correspondence.py:276,286).
    """
    n, h, w, c = x.shape
    patches = lax.conv_general_dilated_patches(
        x, filter_shape=(k, k), window_strides=(1, 1),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (n, h, w, c*k*k) with (c, kh, kw) feature order
    return patches.reshape(n, h * w, c * k * k)


def one_hot_scatter(label: Array, num_classes: int) -> Array:
    """label (N, H, W) int -> one-hot (N, H, W, num_classes) float32,
    mirroring FloatTensor.scatter_ (pix2pix_model.py:176-187)."""
    return jax.nn.one_hot(label, num_classes, dtype=jnp.float32)
