"""Functional building blocks: convolutions with torch-compatible padding,
spectral-norm / equalized-LR weight reparameterisations, linear layers.

TPU-first: NHWC activations, HWIO kernels (XLA's preferred conv layout on
TPU), f32 parameters with an optional bf16 compute policy for MXU matmuls.

Semantics-parity notes (citations into /root/reference):
- xavier-normal init with gain=0.02 and zero bias mirrors
  models/networks/base_network.py:39-52 (default --init_type xavier,
  --init_variance 0.02, options/base_options.py:59-60).
- spectral norm does one power iteration per *training* forward and carries
  the left singular vector estimate `u` as explicit state, matching
  torch.nn.utils.spectral_norm used at models/networks/architecture.py:48-51.
  In JAX the state lives in a `spectral` variable collection instead of a
  module attribute mutated in-place.
- equalized LR rescales the weight by sqrt(2/fan_in) at each forward
  (models/networks/normalization.py:243-266).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Global compute-dtype policy for convolutions (bf16 feeds the MXU at full
# rate; f32 params are cast per-op and accumulation stays f32). Set from
# Options.compute_dtype by the CLIs via set_compute_dtype(); None = f32.
_COMPUTE_DTYPE = None


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def get_compute_dtype():
    return _COMPUTE_DTYPE


def xavier_normal_init(gain: float = 0.02):
    """torch.nn.init.xavier_normal_ for HWIO conv kernels / (in,out) dense."""
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:  # HWIO
            kh, kw, cin, cout = shape
            fan_in, fan_out = cin * kh * kw, cout * kh * kw
        elif len(shape) == 2:  # (in, out)
            fan_in, fan_out = shape
        else:
            raise ValueError(f"unsupported shape {shape}")
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)
    return init


def reflect_pad_2d(x: Array, pad: int) -> Array:
    """nn.ReflectionPad2d on NHWC."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class OneHotLabels:
    """Lazy one_hot(labels, n_classes): a duck-typed stand-in for a dense
    (B, H, W, C) one-hot activation. PROFILE.md pins the seg adaptor's first
    conv as HBM-bound reading a 118 MB bf16 one-hot that is informationally
    a 1.5 MB label map; passing this wrapper instead lets conv2d route into
    the Pallas gather-conv (ops/pallas_conv.conv3x3_onehot — the one-hot
    expands in VMEM, never in HBM). Every other consumer densifies via
    .dense(), which matches pix2pix.preprocess_input's scatter exactly.
    Matches /root/reference/models/pix2pix_model.py:176-187 feeding
    generator.py:101-118."""

    def __init__(self, labels: Array, n_classes: int, dtype=jnp.float32):
        self.labels = labels          # (B, H, W) int
        self.n_classes = n_classes
        self.dtype = dtype

    @property
    def shape(self):
        b, h, w = self.labels.shape
        return (b, h, w, self.n_classes)

    @property
    def ndim(self):
        return 4

    def astype(self, dt):
        return OneHotLabels(self.labels, self.n_classes, dt)

    def dense(self) -> Array:
        return jax.nn.one_hot(self.labels, self.n_classes, dtype=self.dtype)


def conv2d(x: Array, kernel: Array, bias: Optional[Array] = None, *,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           compute_dtype=None, reflect: bool = False,
           want_stats: bool = False):
    """torch F.conv2d semantics on NHWC input, HWIO kernel; reflect=True
    applies a ReflectionPad2d ring of (k-1)/2*dilation first (the single
    dispatch point for the fused kernel's in-VMEM reflection).

    Under the bf16 compute policy operands AND output stay bf16: the MXU
    accumulates in f32 internally and only the output store rounds, while
    keeping activations bf16 between layers halves HBM/VPU traffic (measured
    2.4x on a 512-channel conv chain). Mixing bf16 operands with an f32
    preferred_element_type breaks the conv transpose rule under AD, so the
    output dtype follows the operands."""
    if compute_dtype is None:
        compute_dtype = _COMPUTE_DTYPE
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    if reflect:
        assert padding == 0 and stride == 1

    def _tag(y):
        # checkpoint_name is inert outside a jax.checkpoint(policy=...)
        # scope; under --remat_policy conv/conv_small the per-SPADE-block
        # remat saves these outputs instead of recomputing every conv in
        # the backward pass (see models/generator.py::remat_policy)
        from jax.ad_checkpoint import checkpoint_name
        name = "conv_small" if y.shape[1] * y.shape[2] <= 4096 else "conv_large"
        return checkpoint_name(y, name)
    if isinstance(x, OneHotLabels):
        from cocosnet_tpu.ops.pallas_conv import (conv3x3_onehot,
                                                  conv3x3_onehot_supported)
        if (tuple(kernel.shape[:2]) == (3, 3) and stride == 1
                and dilation == 1 and padding == 1 and not reflect
                and conv3x3_onehot_supported(
                    x.labels.shape, x.n_classes, kernel.shape[-1],
                    itemsize=jnp.dtype(x.dtype).itemsize)):
            if want_stats:
                y, mean, var = conv3x3_onehot(x.labels, kernel, bias,
                                              dtype=x.dtype, want_stats=True)
                return _tag(y), mean, var
            return _tag(conv3x3_onehot(x.labels, kernel, bias, dtype=x.dtype))
        # unsupported shape / backend / training trace: materialize and take
        # the ordinary dispatch below (identical semantics by construction)
        return conv2d(x.dense(), kernel, bias, stride=stride, padding=padding,
                      dilation=dilation, compute_dtype=compute_dtype,
                      reflect=reflect, want_stats=want_stats)
    from cocosnet_tpu.ops.pallas_conv import (conv3x3_fused,
                                              conv3x3_fused_stats,
                                              conv3x3_stats_supported,
                                              conv3x3_supported)
    if want_stats and conv3x3_stats_supported(
            x.shape, kernel.shape, stride=stride, dilation=dilation,
            padding=1 if reflect else padding,
            itemsize=jnp.dtype(x.dtype).itemsize):
        # conv + instance-norm moments in ONE kernel pass (inference): the
        # (sum, sumsq) reduce from the f32 accumulator per row block, so no
        # second HBM pass over the output computes the statistics
        y, mean, var = conv3x3_fused_stats(x, kernel, bias, reflect=reflect)
        return _tag(y), mean, var
    if want_stats:
        # stats fusion unavailable (training trace / shape / backend):
        # run the best conv path, then jnp statistics — identical math to
        # norms.instance_norm on the materialized output, differentiable
        y = conv2d(x, kernel, bias, stride=stride, padding=padding,
                   dilation=dilation, compute_dtype=compute_dtype,
                   reflect=reflect, want_stats=False)  # inner call tags y
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
        var = jnp.var(y32, axis=(1, 2), keepdims=True)
        return y, mean, var
    if conv3x3_supported(
            x.shape, kernel.shape, stride=stride, dilation=dilation,
            padding=1 if reflect else padding,
            itemsize=jnp.dtype(x.dtype).itemsize):
        # fused implicit-GEMM kernel (ops/pallas_conv.py): same math, f32
        # accumulation; bias adds pre-rounding (one fewer bf16 round); a
        # reflect ring realizes inside VMEM instead of a padded HBM copy
        return _tag(conv3x3_fused(x, kernel, bias, reflect=reflect))
    from cocosnet_tpu.ops import pallas_conv as PC
    if (PC._IN_TRAINING_TRACE and tuple(kernel.shape[:2]) == (3, 3)
            and stride == 1 and dilation == 1
            and (reflect or padding == 1)
            and PC.conv3x3_dw_supported(
                x.shape, kernel.shape, reflect=reflect,
                itemsize=jnp.dtype(x.dtype).itemsize)):
        # training: forward + dL/dx are the SAME XLA ops as the plain path
        # below (fusions untouched); only dL/dW + dL/db take the Pallas dW
        # kernel — the G-backward bound PROFILE_TRAIN.md pins at ~39% MFU
        b = bias if bias is not None else \
            jnp.zeros((kernel.shape[-1],), jnp.float32)
        return _tag(PC.conv3x3_xla_pdw(x, kernel, b, reflect))
    if reflect:
        x = reflect_pad_2d(x, dilation * (kernel.shape[0] - 1) // 2)
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return _tag(y)


def _l2_normalize(v: Array, eps: float = 1e-12) -> Array:
    return v / (jnp.linalg.norm(v) + eps)


def _spectral_sigma(mod: nn.Module, w_mat: Array, prefix: str = "") -> Array:
    """Spectral-norm sigma with torch-compatible state semantics.

    Train (the `spectral` collection is mutable): one power iteration per
    forward, u and v stored. Eval: sigma from the *stored* u and v without
    advancing them — exactly torch.nn.utils.spectral_norm.
    """
    cout, cin_flat = w_mat.shape

    def _init(shape, seed):
        return _l2_normalize(jax.random.normal(jax.random.PRNGKey(seed), shape))

    u_var = mod.variable("spectral", prefix + "u", lambda: _init((cout,), 0))
    v_var = mod.variable("spectral", prefix + "v", lambda: _init((cin_flat,), 1))
    training = mod.is_mutable_collection("spectral") and not mod.is_initializing()
    if training:
        v = _l2_normalize(jnp.matmul(w_mat.T, u_var.value))
        u = _l2_normalize(jnp.matmul(w_mat, v))
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        u_var.value = u
        v_var.value = v
    else:
        u, v = u_var.value, v_var.value
    return jnp.vdot(u, jnp.matmul(w_mat, v))


class Conv2d(nn.Module):
    """Plain conv with torch-style symmetric zero padding.

    weight_norm: None | 'spectral' | 'equal_lr'  (architecture.py:40-51)
    use_bias=False mirrors the reference deleting conv bias when a
    parameter-free norm follows (normalization.py:41-45).
    reflect_pad=True replaces the reference's ReflectionPad2d->Conv pair
    (architecture.py:43-47, correspondence.py:15-26): the module pads the
    ring itself, which lets the fused TPU kernel realize the reflection
    in-VMEM instead of materializing a padded copy.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    weight_norm: Optional[str] = None
    init_gain: float = 0.02
    compute_dtype: Optional[jnp.dtype] = None
    reflect_pad: bool = False

    @nn.compact
    def __call__(self, x: Array, want_stats: bool = False):
        cin = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", xavier_normal_init(self.init_gain),
                            (k, k, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        if self.weight_norm == "spectral":
            kernel = self._spectral_normalize(kernel)
        elif self.weight_norm == "equal_lr":
            # EqualLR: w * sqrt(2/fan_in), fan_in = cin*kh*kw
            # (normalization.py:246-249)
            fan_in = cin * k * k
            kernel = kernel * jnp.sqrt(2.0 / fan_in).astype(kernel.dtype)

        return conv2d(x, kernel, bias, stride=self.stride, padding=self.padding,
                      dilation=self.dilation, compute_dtype=self.compute_dtype,
                      reflect=self.reflect_pad, want_stats=want_stats)

    def _spectral_normalize(self, kernel: Array) -> Array:
        # torch reshapes OIHW -> (O, I*kh*kw); our HWIO kernel transposes to
        # OIHW first so converted checkpoints carry compatible `u` vectors.
        cout = self.features
        w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(cout, -1)
        return kernel / _spectral_sigma(self, w_mat)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    weight_norm: Optional[str] = None
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel = self.param("kernel", xavier_normal_init(self.init_gain),
                            (cin, self.features))
        if self.weight_norm == "spectral":
            kernel = kernel / _spectral_sigma(self, kernel.T)  # torch (out, in)
        elif self.weight_norm == "equal_lr":
            kernel = kernel * jnp.sqrt(2.0 / cin).astype(kernel.dtype)
        y = jnp.matmul(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class PReLU(nn.Module):
    """nn.PReLU with a single shared slope, init 0.25 (torch default);
    used by the correspondence residual stack (correspondence.py:20)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def leaky_relu(x: Array, slope: float = 0.2) -> Array:
    return jnp.where(x >= 0, x, slope * x)
