"""Frozen VGG19 feature extractor for perceptual/contextual losses.

Mirrors VGG19_feature_color_torchversion (correspondence.py:79-146) with the
caffe-style preprocessing of util/util.py:45-54: RGB(±1 when
vgg_normal_correct) -> BGR, mean-subtract, x255.

Weights come from the reference's `models/vgg19_conv.pth` via
tools/convert_weights.py (NCHW->HWIO); when absent the module runs with
random init (shape-correct, used by unit tests only).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cocosnet_tpu.nn.layers import Conv2d
from cocosnet_tpu.ops.image import avg_pool, max_pool

Array = jax.Array

# BGR channel means used by the caffe-trained VGG (util/util.py:52)
_VGG_MEAN_BGR = (0.40760392, 0.45795686, 0.48501961)

_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64),
    ("conv2_1", 128), ("conv2_2", 128),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
]


def vgg_preprocess(x: Array, vgg_normal_correct: bool = False) -> Array:
    """util/util.py:45-54 on NHWC input."""
    if vgg_normal_correct:
        x = (x + 1.0) / 2.0
    bgr = x[..., ::-1]
    mean = jnp.asarray(_VGG_MEAN_BGR, dtype=x.dtype)
    return (bgr - mean) * 255.0


class VGG19Features(nn.Module):
    """Returns activations for the requested keys (r11..r54, p1..p5)."""
    pool: str = "max"
    vgg_normal_correct: bool = False
    ic: int = 3

    @nn.compact
    def __call__(self, x: Array, out_keys: Sequence[str],
                 preprocess: bool = True) -> List[Array]:
        if preprocess:
            x = vgg_preprocess(x, self.vgg_normal_correct)
        pool_fn = max_pool if self.pool == "max" else avg_pool
        out: Dict[str, Array] = {}
        h = x
        for name, width in _LAYERS:
            block, idx = name[4], name[6]
            h = Conv2d(width, 3, padding=1, name=name)(h)
            h = jax.nn.relu(h)
            out[f"r{block}{idx}"] = h
            if idx == ("2" if block in "12" else "4"):
                h = pool_fn(h, 2)
                out[f"p{block}"] = h
        # taps feed f32 loss math regardless of the activation policy
        return [out[k].astype(jnp.float32) for k in out_keys]
